package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for persisted single-table artifacts. */
object Artifacts {

  /** THE `_SUCCESS`-gated parquet read every single-table artifact
    * store shares (`Dedup.readMinhashSignatures`, `Classify`'s model
    * tables): a crashed overwrite deletes the target before the job
    * commits, so a store without its job-commit marker may be a
    * committer-dependent partial state — and these tables feed joins
    * where partial or empty input is SILENTLY wrong (missed
    * duplicates, empty scored batches), so the read must refuse, not
    * degrade. One definition so a future fix to the gate (URI
    * normalization, marker convention) cannot leave one reader's
    * crash behavior silently diverged from another's.
    *
    * `who` names the calling reader in the error; `hint` says how to
    * rebuild the artifact.
    */
  def gatedRead(spark: SparkSession, dir: String, who: String,
      hint: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")),
      s"$who: no _SUCCESS job-commit marker under $dir — the artifact " +
        s"was never completely written; $hint")
    spark.read.parquet(dir)
  }
}
