package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline built from the library's
  * reuse entry points — the shape a production run takes, with every
  * expensive artifact computed ONCE and fed forward (the per-query
  * declared API recomputes per call by design; a pipeline must not):
  *
  *   1. quality gate      TextOps.qualityScores, threshold filter
  *   2. decontamination   TextOps.contamination vs a held-out probe set
  *   3. sketch ONCE       Dedup.minhashSignatures
  *   4. candidates        Dedup.candidatesFromSignatures (banded LSH)
  *   5. clusters          Dedup.clustersFromCandidates (star contraction)
  *   6. emit corpus       quality-canonical member per cluster
  *                        (Dedup.keepBestPerCluster, reusing the step-1
  *                        scores) + anti-join to drop the rest
  *   7. shuffle + encode  TextOps.shuffleRank (reproducible epoch order)
  *                        + TextOps.encodeTokens (vocab-id sequences,
  *                        joined into the written rows)
  *   8. split + write     hash split, parquet partitioned by split
  *
  * Scale notes: steps 1–2 are scan-shaped; 3–5 shuffle O(docs·bands)
  * ids, never text; 6 broadcasts the (tiny) drop set so the corpus
  * never shuffles; 7 is a two-phase rank (no global window) + one
  * broadcast vocab join; 8 writes partition-pruned output. The only
  * driver materializations are the printed summary counts.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.PipelineDemo [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // instant-preserving TIMESTAMP_NTZ normalization (Tables.normalizeTs)
      // requires a UTC session zone — pin it in EVERY entry point, not
      // just Verify, so a non-UTC host cannot shift event instants
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_pipeline_out"

    val docs = graft.core.Tables.documents(spark, dir)
    val n0 = docs.count()

    // 1. quality gate: drop the bottom of the quality distribution.
    // Scores persist because step 6 REUSES them for the keep-best
    // argmax — one corpus quality pass, not two (the declared
    // q_pipeline_e2e twin pins these semantics).
    val qualityAll = graft.ops.TextOps.qualityScores(docs)
      .select(col("doc_id"), col("quality"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gated = docs
      .join(qualityAll.filter(col("quality") >= 0.5).select("doc_id"), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = gated.count()

    // 2. decontamination vs the held-out probe docs (doc_id < 3 stand
    // in) — off a shingle pass materialized ONCE and shared with the
    // step-3 sketch (the per-doc window pass is the dominant text cost;
    // the declared q_pipeline_e2e twin pins the same reuse)
    val gatedShingles = graft.text.Shingles.shingles(gated, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contaminated = graft.ops.TextOps
      .contaminationFromShingles(
        gatedShingles.filter(col("doc_id") >= 3), docs.filter(col("doc_id") < 3), 3)
      .filter(col("n_hits") >= 3)
      .select("doc_id")
    val clean = gated.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    val n2 = clean.count()

    // 3–5. sketch ONCE (off the same shingle pass), then candidates →
    // clusters off the same table
    val sigs = graft.ops.Dedup.minhashSignaturesFromShingles(
      gatedShingles.join(broadcast(contaminated), Seq("doc_id"), "left_anti"))
    val cand = graft.ops.Dedup.candidatesFromSignatures(sigs, 0.5)
    val clusters = graft.ops.Dedup.clustersFromCandidates(cand)

    // 6. the deduplicated corpus — canonical member per cluster chosen
    // by QUALITY (not min id), reusing the cluster decision table and
    // the step-1 scores
    val best = graft.ops.Dedup.keepBestPerCluster(clusters, qualityAll)
    val drop = clusters.join(
        best.select(col("keep_doc_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select("doc_id")
    val kept = clean.join(broadcast(drop), Seq("doc_id"), "left_anti")
    val n3 = kept.count()

    // 7. reproducible epoch order + vocab-id encoding, both JOINED into
    // the rows the trainer reads — the encode pass is paid once and its
    // output ships in the written parquet, not just in a printed scalar
    val encoded = graft.ops.TextOps.encodeTokens(kept, 20)
    val ranked = kept
      .join(graft.ops.TextOps.shuffleRank(kept)
        .select("doc_id", "shuffle_pos"), Seq("doc_id"))
      .join(encoded.select("doc_id", "n_tokens", "n_oov", "ids_md5"), Seq("doc_id"))

    // 8. deterministic 80/10/10 split, written partition-pruned
    val split = ranked.withColumn("split",
      when(graft.ops.TextOps.hashBucket(col("doc_id")) < 80, "train")
        .when(graft.ops.TextOps.hashBucket(col("doc_id")) < 90, "valid")
        .otherwise("test"))
    split.write.mode("overwrite").partitionBy("split").parquet(out)
    val written = spark.read.parquet(out)
    val perSplit = written.groupBy("split").count()
      .orderBy("split").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    // OOV coverage, read back from the WRITTEN rows (no extra encode pass)
    val nOov = written.agg(sum(col("n_oov"))).head.getLong(0)
    gated.unpersist(); qualityAll.unpersist(); gatedShingles.unpersist()

    println(s"[pipeline] corpus=$n0 quality_gate=$n1 decontaminated=$n2 deduped=$n3 oov_tokens=$nOov")
    println(s"[pipeline] written $out: $perSplit")
    spark.stop()
  }
}
