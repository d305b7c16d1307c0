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

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** THE versioned-dir listing/seal/prune core, shared by the
    * single-table model stores here (`seal = "_SUCCESS"` — the
    * table's own job-commit marker) and the multi-table IVFADC index
    * (`seal = "meta/_SUCCESS"` — meta written last seals the whole
    * version; [[graft.ops.VectorOps]]). One implementation so the two
    * stores' version-resolution and prune rules cannot silently
    * drift — the gatedRead single-definition rationale applied to the
    * versioning contract.
    */
  private[graft] def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v=\\d+") => s.stripPrefix("v=").toLong }
  }

  private[graft] def isCompleteVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long, seal: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v/$seal"))

  /** The prune rule: keep the newest `keep` COMPLETE versions, delete
    * older complete ones and incomplete versions BELOW the newest
    * complete (crashed writes a later one superseded); an incomplete
    * version ABOVE the newest complete may be in flight and survives.
    * Returns the kept complete versions (callers with per-version
    * inner state — the index's codes appends — sweep those next).
    */
  private[graft] def pruneVersionDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, keep: Int, seal: String): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val all = versionDirs(fs, dir).sorted
    val complete = all.filter(isCompleteVersion(fs, dir, _, seal))
    if (complete.isEmpty) return Seq.empty
    val keepSet = complete.takeRight(keep).toSet
    all.filter(v =>
        (complete.contains(v) && !keepSet(v)) ||
        (!complete.contains(v) && v < complete.max))
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=$v"), true))
    keepSet.toSeq.sorted
  }

  private def versions(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = versionDirs(fs, dir)

  private def isComplete(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long): Boolean =
    isCompleteVersion(fs, dir, v, "_SUCCESS")

  /** VERSIONED single-table model write — the `writeIvfPqIndex` scheme
    * specialized to one table: each refresh lands in a fresh `v=<n+1>/`
    * whose own `_SUCCESS` job-commit marker seals it, and
    * [[readLatestVersioned]] resolves the highest complete version. A
    * crashed refresh therefore leaves the PREVIOUS model serving
    * (safe-and-serving), where the flat overwrite-in-place scheme left
    * a loud refusal until retrain (safe-but-unavailable) — r10 verdict
    * stretch #9. Old versions are reclaimed deliberately with
    * [[pruneModelVersions]], never by the write.
    */
  def writeVersioned(df: DataFrame, dir: String): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/v=${(0L +: versions(fs, dir)).max + 1}")
  }

  /** Resolve-and-read the highest COMPLETE model version; a dir with
    * no complete version falls back to the legacy flat layout through
    * the same [[gatedRead]] `_SUCCESS` gate (old artifacts stay
    * readable; a torn flat dir still refuses loudly).
    */
  def readLatestVersioned(spark: SparkSession, dir: String, who: String,
      hint: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val complete = versions(fs, dir).filter(isComplete(fs, dir, _))
    if (complete.nonEmpty) spark.read.parquet(s"$dir/v=${complete.max}")
    else gatedRead(spark, dir, who, hint)
  }

  /** Deliberate model-version cleanup — [[pruneVersionDirs]] with the
    * single-table seal marker.
    */
  def pruneModelVersions(spark: SparkSession, dir: String,
      keep: Int = 1): Unit = {
    pruneVersionDirs(fsOf(spark, dir), dir, keep, "_SUCCESS")
    ()
  }
}
