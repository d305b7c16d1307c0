package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps

/** Index maintenance as ONE schedulable op (r10 verdict #4) plus the
  * retrain marker-carry (r10 ADVICE #2) and the recall→nprobe dial
  * (r10 verdict #6).
  */
class IndexMaintainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.embeddings(spark, dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def codeVids(ixDir: String): Seq[Long] =
    VectorOps.readIvfPqIndex(spark, ixDir).codes
      .select(col("vid").cast("long")).collect().map(_.getLong(0)).toSeq.sorted

  test("retrain carries replay markers: a pre-retrain stream batch replay skips " +
      "even after prune(keep=1) removed the old version") {
    val ixDir = Files.createTempDirectory("graft-retrain-carry").toString + "/ix"
    val b1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 400), ixDir, 8, 8, 16, 64)
    VectorOps.appendBatchToIvfPqIndex(
      VectorOps.readIvfPqIndex(spark, ixDir), b1, ixDir, 1, "ckptR")
    // retrain over everything ingested (the retrain contract), then
    // prune the old version IMMEDIATELY — before the r11 carry this
    // was the documented-unsafe window: the replay evidence lived only
    // in the pruned version's live marker
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 450), ixDir, 8, 8, 16, 64)
    VectorOps.pruneIvfPqVersions(spark, ixDir, keep = 1)
    val after = VectorOps.readIvfPqIndex(spark, ixDir)
    val codes = rows(after.codes)
    VectorOps.appendBatchToIvfPqIndex(after, b1, ixDir, 1, "ckptR")
    assert(rows(VectorOps.readIvfPqIndex(spark, ixDir).codes) === codes,
      "replay of a pre-retrain batch after prune duplicated its vectors")
    // and a fresh stream id allocates ABOVE the absorbed range
    assert(VectorOps.nextAppendId(spark, ixDir) === 2L)
  }

  test("maintainIndex: two fold cycles, a threshold-forced rebalance-retrain, and " +
      "a replay — no vector duplicated or lost at any step") {
    val ixDir = Files.createTempDirectory("graft-maintain").toString + "/ix"
    val b1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val b2 = emb.filter(col("vec_id") >= 450 && col("vec_id") < 475)
    val b3 = emb.filter(col("vec_id") >= 475)
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 400), ixDir, 8, 8, 16, 64)
    val ix0 = VectorOps.readIvfPqIndex(spark, ixDir)
    VectorOps.appendBatchToIvfPqIndex(ix0, b1, ixDir, 1, "ckptM")
    VectorOps.appendBatchToIvfPqIndex(ix0, b2, ixDir, 2, "ckptM")
    val allVids = codeVids(ixDir)

    // cycle 1: 3 sealed appends > maxAppends=1 → fold; balanced enough
    // at maxShare=1.0 → no rebalance; report reflects the post-state
    val rep1 = VectorOps.maintainIndex(spark, ixDir,
      emb.filter(col("vec_id") < 475), id => id < 3,
      maxAppends = 1, maxShare = 1.0, keepVersions = 1).collect().head
    assert(rep1.getAs[Boolean]("compacted"))
    assert(!rep1.getAs[Boolean]("rebalanced"))
    assert(rep1.getAs[Long]("n_sealed_appends") === 1L)
    assert(rep1.getAs[Long]("n_complete_versions") === 1L)
    assert(rep1.getAs[Long]("n_probe_queries") === 3L)
    val r1 = rep1.getAs[Double]("mean_recall")
    assert(r1 >= 0.0 && r1 <= 1.0)
    assert(codeVids(ixDir) === allVids, "fold cycle 1 changed the vector set")

    // cycle 2: one more stream batch, fold again (marker carry is
    // transitive across cycles)
    VectorOps.appendBatchToIvfPqIndex(
      VectorOps.readIvfPqIndex(spark, ixDir), b3, ixDir, 3, "ckptM")
    val allVids2 = codeVids(ixDir)
    val rep2 = VectorOps.maintainIndex(spark, ixDir, emb, id => id < 3,
      maxAppends = 1, maxShare = 1.0, keepVersions = 1).collect().head
    assert(rep2.getAs[Boolean]("compacted"))
    assert(codeVids(ixDir) === allVids2, "fold cycle 2 changed the vector set")

    // cycle 3: an impossible share threshold forces the
    // rebalance-retrain path (split + retrain as a new version)
    val rep3 = VectorOps.maintainIndex(spark, ixDir, emb, id => id < 3,
      maxAppends = 16, maxShare = 0.0001, keepVersions = 1).collect().head
    assert(!rep3.getAs[Boolean]("compacted"))
    assert(rep3.getAs[Boolean]("rebalanced"))
    val ixReb = VectorOps.readIvfPqIndex(spark, ixDir)
    assert(ixReb.nCentroids > 8, "rebalance must have split at least one cell")
    assert(codeVids(ixDir) === allVids2,
      "rebalance-retrain changed the vector set")

    // replays of batches absorbed two folds + a retrain + prunes ago
    // still skip — the carried markers are the evidence
    val codesNow = rows(ixReb.codes)
    VectorOps.appendBatchToIvfPqIndex(ixReb, b1, ixDir, 1, "ckptM")
    VectorOps.appendBatchToIvfPqIndex(ixReb, b3, ixDir, 3, "ckptM")
    assert(rows(VectorOps.readIvfPqIndex(spark, ixDir).codes) === codesNow,
      "replay through the maintained lifecycle duplicated vectors")
  }

  test("deletion lifecycle: tombstone suppresses immediately, retrain cannot " +
      "resurrect, compaction hard-deletes and frees the ids for re-ingest") {
    import spark.implicits._
    val ixDir = Files.createTempDirectory("graft-delete").toString + "/ix"
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 400), ixDir, 8, 8, 16, 64)
    VectorOps.appendBatchToIvfPqIndex(VectorOps.readIvfPqIndex(spark, ixDir),
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450), ixDir, 1, "ckptD")
    val before = codeVids(ixDir)
    // delete ids spanning the training write AND the streamed append
    val del = Seq(5L, 17L, 410L)
    VectorOps.deleteFromIvfPqIndex(spark, ixDir, del.toDF("vid"))
    val kept = before.filterNot(del.contains)
    assert(codeVids(ixDir) === kept, "tombstone did not suppress immediately")
    // a retrain over a corpus that STILL CONTAINS the deleted rows
    // carries the tombstones — deletion survives model refreshes
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 450), ixDir, 8, 8, 16, 64)
    assert(codeVids(ixDir) === kept, "retrain resurrected deleted vectors")
    // re-admission REFUSES while the deletion is still pending: a
    // log-only edit would silently no-op and the next compaction would
    // move the vids into the log — suppressed forever with no error
    val ePend = intercept[IllegalArgumentException] {
      VectorOps.allowReingest(spark, ixDir, del.toDF("vid"))
    }
    assert(ePend.getMessage.contains("PENDING"), ePend.getMessage)
    // pending tombstones force the fold even on a compact codes table
    assert(VectorOps.compactIvfPqIndexIfFragmented(spark, ixDir, maxAppends = 16),
      "pending tombstones must force compaction")
    assert(codeVids(ixDir) === kept)
    // post-compaction the deletion is PHYSICAL and DURABLE (r11
    // ADVICE): the materialized vids moved into the deletion log, so
    // an append fed an unpurged corpus — or a retrain over it — must
    // NOT resurrect them
    VectorOps.appendToIvfPqIndex(VectorOps.readIvfPqIndex(spark, ixDir),
      emb.filter(col("vec_id").isin(del: _*)), ixDir)
    assert(codeVids(ixDir) === kept,
      "append resurrected logged deletions without allowReingest")
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 450), ixDir, 8, 8, 16, 64)
    assert(codeVids(ixDir) === kept,
      "post-compaction retrain resurrected logged deletions")
    // deliberate re-admission: allowReingest clears the log entries,
    // then the same append serves again
    VectorOps.allowReingest(spark, ixDir, del.toDF("vid"))
    VectorOps.appendToIvfPqIndex(VectorOps.readIvfPqIndex(spark, ixDir),
      emb.filter(col("vec_id").isin(del: _*)), ixDir)
    assert(codeVids(ixDir) === before, "re-ingest after allowReingest failed")
    // …and a second fold with no pending deletions is still a no-op
    // beyond folding the new append
    VectorOps.compactIvfPqIndex(spark, ixDir)
    assert(codeVids(ixDir) === before)
  }

  test("rebalance refuses an embeddings frame missing indexed vectors — the " +
      "everything-ingested retrain contract is mechanical, not a scaladoc rule") {
    val ixDir = Files.createTempDirectory("graft-rebalance-guard").toString + "/ix"
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 400), ixDir, 8, 8, 16, 64)
    // a streamed batch whose vectors are NOT rows of the base corpus
    val foreign = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      .selectExpr("vec_id + 900000 AS vec_id", "embedding", "label")
    VectorOps.appendBatchToIvfPqIndex(
      VectorOps.readIvfPqIndex(spark, ixDir), foreign, ixDir, 1, "ckptG")
    // forcing the rebalance with only the base corpus would retrain
    // WITHOUT the appended vectors — and their carried replay markers
    // would keep skipping re-ingest: permanent loss. Must refuse.
    val e = intercept[IllegalArgumentException] {
      VectorOps.maintainIndex(spark, ixDir, emb.filter(col("vec_id") < 400),
        id => id < 3, maxShare = 0.0001, keepVersions = 1).collect()
    }
    assert(e.getMessage.contains("absent"), e.getMessage)
    // with everything ingested supplied, the same rebalance proceeds
    val rep = VectorOps.maintainIndex(spark, ixDir,
      emb.filter(col("vec_id") < 400).unionByName(foreign),
      id => id < 3, maxShare = 0.0001, keepVersions = 1).collect().head
    assert(rep.getAs[Boolean]("rebalanced"))
    assert(codeVids(ixDir).size === 450)
  }

  test("autoNprobe: recall is monotone in nprobe on a planted split-neighborhood " +
      "corpus and the dial picks the smallest sufficient probe count") {
    import spark.implicits._
    // planted geometry: 8 axis-aligned unit centroids (vids 0-7 — the
    // trainer's stand-in seeds), a FOUR-member cell 0, a six-member
    // cell 1 with strictly separated similarities, and one query whose
    // exact top-10 straddles both cells — nprobe=1 sees only cell 0.
    def unit(i: Int): Array[Double] = {
      val v = new Array[Double](64); v(i) = 1.0; v
    }
    def mix(a: Int, wa: Double, b: Int, wb: Double): Array[Double] = {
      val v = new Array[Double](64); v(a) = wa; v(b) = wb
      val n = math.sqrt(wa * wa + wb * wb)
      v.map(_ / n)
    }
    val rowsIn =
      (0 until 8).map(i => (i.toLong, unit(i))) ++
        (0 until 4).map(j => (10L + j, mix(0, 1.0, 8 + j, 0.15))) ++
        (0 until 6).map(j => (20L + j, mix(1, 1.0, 20 + j, 0.30 + 0.08 * j))) ++
        Seq((100L, mix(0, 0.80, 1, 0.75)))
    val planted = rowsIn.toDF("vec_id", "embedding")
    val ixDir = Files.createTempDirectory("graft-autonprobe").toString + "/ix"
    VectorOps.writeIvfPqIndex(planted, ixDir, 8, 8, 16, 64)
    val ix = VectorOps.readIvfPqIndex(spark, ixDir)

    val (chosen, priced) = VectorOps.autoNprobe(ix, planted,
      id => id === 100L, targetRecall = 0.7, k = 10,
      candidates = Seq(1, 2, 4))
    val table = priced.collect().map(r =>
      (r.getInt(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    // nprobe=1 cannot reach the split neighbors; 2 must
    assert(table.head._1 === 1 && table.head._2 < 0.7,
      s"nprobe=1 unexpectedly met the target: ${table.mkString(",")}")
    assert(chosen === 2, s"expected dial=2, got $chosen (${table.mkString(",")})")
    // monotone on the priced prefix, and the sweep stopped at the
    // first sufficient candidate (4 never priced)
    assert(table.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      s"recall not monotone: ${table.mkString(",")}")
    assert(table.length === 2, s"sweep did not stop early: ${table.mkString(",")}")
    assert(table.forall(_._3 === 1L))

    // a target no offered candidate reaches falls back to the largest
    val (fallback, _) = VectorOps.autoNprobe(ix, planted,
      id => id === 100L, targetRecall = 0.7, k = 10, candidates = Seq(1))
    assert(fallback === 1)

    // maintainIndex closes the loop (r11 verdict #4): at nprobe=1 the
    // probe misses the target, so the report carries the RAISED dial
    // (report-only — the serving config is the operator's to change)
    val rep = VectorOps.maintainIndex(spark, ixDir, planted,
      id => id === 100L, maxShare = 1.0, recallK = 10, nprobe = 1,
      targetRecall = Some(0.7)).collect().head
    assert(rep.getAs[Double]("mean_recall") < 0.7)
    assert(rep.getAs[Double]("target_recall") === 0.7)
    assert(rep.getAs[Int]("recommended_nprobe") === 2,
      s"report did not carry the raised dial: $rep")
    assert(rep.getAs[Double]("recommended_recall") >= 0.7)
    // …and with the target already met, the sweep never runs
    val rep2 = VectorOps.maintainIndex(spark, ixDir, planted,
      id => id === 100L, maxShare = 1.0, recallK = 10, nprobe = 2,
      targetRecall = Some(0.7)).collect().head
    assert(rep2.isNullAt(rep2.fieldIndex("recommended_nprobe")),
      s"sweep ran despite the target being met: $rep2")
  }

  test("maintainIndex refuses under a live concurrent maintenance lease and " +
      "releases its own on exit (r12 verdict #3)") {
    val ixDir = Files.createTempDirectory("graft-maintain-lease").toString + "/ix"
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") < 400), ixDir, 8, 8, 16, 64)
    val fs = new org.apache.hadoop.fs.Path(ixDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(s"$ixDir/_MAINT_LEASE")
    val out = fs.create(p, true)
    try out.write(
      s"other-cron|${System.currentTimeMillis() + 3600000L}".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      VectorOps.maintainIndex(spark, ixDir, emb.filter(col("vec_id") < 400),
        id => id % 50 === 0, maxShare = 1.0)
    }
    assert(e.getMessage.contains("under maintenance"), e.getMessage)
    graft.core.Artifacts.breakMaintenanceLease(spark, ixDir)
    VectorOps.maintainIndex(spark, ixDir, emb.filter(col("vec_id") < 400),
      id => id % 50 === 0, maxShare = 1.0)
    assert(!fs.exists(p), "maintainIndex did not release its lease on exit")
  }
}
