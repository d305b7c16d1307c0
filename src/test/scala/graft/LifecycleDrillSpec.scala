package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Maintain, VectorOps}

/** r12 verdict stretches #8/#9, composed end to end:
  *
  *   - the COLD-START RECOVERY DRILL: one sequence through the full
  *     dedup lifecycle (ingest → delete → heal → compact → reingest)
  *     that simulates a crash at EVERY park/marker boundary in turn,
  *     asserting at each stop that readers refuse (never serve
  *     shrunken state) and that the documented healing op converges
  *     the state back to the from-scratch clustering oracle — the
  *     per-op crash-safety claims, proven as a composition;
  *   - maintainAll: the single cron entry chaining every artifact
  *     family's maintenance with a unified report, sick families
  *     reported rather than thrown.
  */
class LifecycleDrillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def assignSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_id", "cluster_id", "cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("cold-start drill: a crash at every park/marker boundary of the dedup " +
      "lifecycle refuses loudly and heals back to the from-scratch oracle") {
    val state = tmp("dedup-drill")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    // simulate rewriteDirInPlace's only reader-dangerous window (crash
    // between park and swap-in): sealed tmp present, original parked
    def parkDir(root: String, name: String): Unit = {
      assert(org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$root/$name"), fs,
        new org.apache.hadoop.fs.Path(s"$root/_rw_tmp_$name"), false, conf))
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/$name"),
        new org.apache.hadoop.fs.Path(s"$root/_rw_old_$name")))
    }
    val delPred = col("doc_id") % 7 === 3
    val scrubbed = docs.filter(!delPred)

    // ---- stage 0: ingest ------------------------------------------------
    Dedup.clustersIngestBatch(docs.filter(col("doc_id") < 400), 0, state)
    Dedup.clustersIngestBatch(docs.filter(col("doc_id") >= 400), 1, state)

    // ---- stage 1: delete CRASHED before its heal ------------------------
    docs.filter(delPred).select("doc_id").distinct()
      .write.parquet(s"$state/tombstones/del=1")
    intercept[IllegalArgumentException] { // ingest gated on unhealed state
      Dedup.clustersIngestBatch(docs.limit(1), 2, state)
    }
    Dedup.healAssignments(spark, state) // the documented heal
    assert(assignSet(Dedup.readClusterAssignment(spark, state))
      === assignSet(Dedup.dupClusters(scrubbed, 0.5)), "stage 1 did not heal")

    // ---- stage 2: heal's own rewrite CRASHED mid-swap -------------------
    parkDir(s"$state/assign", "ingest_batch=1")
    intercept[IllegalArgumentException] { // reader refuses on the park
      Dedup.readClusterAssignment(spark, state)
    }
    Dedup.healAssignments(spark, state) // heals parks on entry, idempotent
    assert(assignSet(Dedup.readClusterAssignment(spark, state))
      === assignSet(Dedup.dupClusters(scrubbed, 0.5)), "stage 2 did not heal")

    // ---- stage 3: compaction's materialize rewrite CRASHED mid-swap -----
    parkDir(s"$state/sigs", "ingest_batch=0")
    intercept[IllegalArgumentException] { // store reader refuses
      Dedup.readSignatureStoreState(spark, state).count()
    }
    Dedup.compactSignatureStore(spark, state) // heals, then materializes
    assert(Dedup.readSignatureStoreState(spark, state)
      .filter(delPred).count() === 0, "stage 3 left deleted signatures")
    assert(graft.core.Artifacts.sealedFamilyDirs(fs,
      s"$state/tombstones", "del").isEmpty, "stage 3 left tombstones")
    assert(graft.core.Artifacts.sealedFamilyDirs(fs,
      s"$state/deletion_log", "log").count(_._2) === 1,
      "stage 3 did not land the deletion log")

    // ---- stage 4: crash BETWEEN log write and tombstone clear -----------
    // (both filters active — harmless overlap the next compaction clears)
    docs.filter(delPred).select("doc_id").distinct()
      .write.parquet(s"$state/tombstones/del=2")
    assert(Dedup.readSignatureStoreState(spark, state)
      .filter(delPred).count() === 0)
    Dedup.compactSignatureStore(spark, state)
    assert(graft.core.Artifacts.sealedFamilyDirs(fs,
      s"$state/tombstones", "del").isEmpty, "stage 4 overlap did not clear")

    // ---- stage 5: re-admission's family rewrite CRASHED mid-swap --------
    parkDir(state, "deletion_log")
    // the real rewriter seals its tmp with a root-level _SUCCESS (the
    // family dirs carry only their own); the simulation must too
    fs.create(new org.apache.hadoop.fs.Path(
      s"$state/_rw_tmp_deletion_log/_SUCCESS"), true).close()
    intercept[IllegalArgumentException] { // the log read path refuses
      Dedup.readSignatureStoreState(spark, state).count()
    }
    val readmit = docs.filter(delPred && col("doc_id") % 2 === 1)
      .select("doc_id").localCheckpoint(true)
    Dedup.allowReingestDocs(spark, state, readmit) // heals on entry
    Dedup.clustersIngestBatch(docs.filter(delPred), 2, state)
    val stillDeleted = delPred && col("doc_id") % 2 === 0
    assert(assignSet(Dedup.readClusterAssignment(spark, state))
      === assignSet(Dedup.dupClusters(docs.filter(!stillDeleted), 0.5)),
      "stage 5 re-admission did not converge to the partially-scrubbed oracle")
  }

  test("maintainAll (r12 stretch #9): one cron entry maintains every family " +
      "with a unified report; a sick family reports instead of blocking") {
    import spark.implicits._
    val root = tmp("maintain-all")
    // family 1: dedup state with a crashed delete pending its heal
    val st = s"$root/dedup"
    Dedup.clustersIngestBatch(docs.filter(col("doc_id") < 400), 0, st)
    docs.filter(col("doc_id") % 7 === 3).select("doc_id").distinct()
      .write.parquet(s"$st/tombstones/del=1")
    // family 2: a persisted IVFADC index
    val ix = s"$root/ix"
    val emb = graft.core.Tables.embeddings(spark, dir)
    VectorOps.writeIvfPqIndex(emb, ix, 8, 8, 16, 64)
    // family 3: an NB count store with a superseded fold version
    val nb = s"$root/nb"
    graft.ops.Classify.writeNbCounts(docs.filter(col("doc_id") < 300), nb)
    graft.ops.Classify.updateNbCountsBatch(spark, nb,
      docs.filter(col("doc_id") >= 300), 0L, "drill")
    val rep = Maintain.maintainAll(spark,
      dedupStates = Seq(st),
      indexes = Seq(Maintain.IndexFamily(ix, emb, id => id % 50 === 0)),
      foldedStores = Seq(nb))
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getString(3)))
    assert(rep.length === 3)
    assert(rep.forall(_._2), s"families failed: ${rep.filterNot(_._2).mkString}")
    val byFam = rep.map(r => r._1 -> r._3).toMap
    assert(byFam("dedup_state").contains("healed_delete=true"))
    assert(byFam("dedup_state").contains("dup_recall=1.0"))
    assert(byFam("ivfpq_index").contains("mean_recall="))
    assert(byFam("folded_counts").contains("versions_after=1"))
    // the heal actually served: no tombstoned doc holds a membership
    assert(Dedup.readClusterAssignment(spark, st)
      .filter(col("doc_id") % 7 === 3).count() === 0)

    // a SICK family (live maintenance lease held elsewhere) reports
    // ok=false and the other families still maintain
    val out = fs2(st).create(
      new org.apache.hadoop.fs.Path(s"$st/_MAINT_LEASE"), true)
    try out.write(
      s"other|${System.currentTimeMillis() + 3600000L}".getBytes("UTF-8"))
    finally out.close()
    val rep2 = Maintain.maintainAll(spark,
      dedupStates = Seq(st),
      foldedStores = Seq(nb))
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getString(3)))
    val dedupRow = rep2.find(_._1 == "dedup_state").get
    assert(!dedupRow._2 && dedupRow._3.contains("under maintenance"), dedupRow)
    assert(rep2.find(_._1 == "folded_counts").get._2,
      "a sick family blocked the healthy one")
  }

  private def fs2(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())
}
