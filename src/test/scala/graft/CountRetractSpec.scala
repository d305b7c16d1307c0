package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classify

/** Retraction folds for the maintained count stores (r11 verdict #2):
  * subtracting a previously-folded batch's integer sufficient
  * statistics must be bit-identical to never having folded it — with
  * the same replay-safe watermark machinery the additive folds carry,
  * so a redelivered retraction can no more double-subtract than a
  * redelivered ingest batch can double-add.
  */
class CountRetractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/c"

  test("NB: add batch then retract it == never added, bit-for-bit, and the " +
      "packed model matches a from-scratch fit on the scrubbed corpus") {
    val cDir = tmp("graft-nb-retract")
    val batch = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    Classify.writeNbCounts(docs.filter(col("doc_id") < 300), cDir)
    assert(Classify.updateNbCountsBatch(spark, cDir, batch, 0L, "ingest"))
    assert(Classify.updateNbCountsBatch(spark, cDir,
      docs.filter(col("doc_id") >= 400), 1L, "ingest"))
    assert(Classify.retractNbCountsBatch(spark, cDir, batch, 0L, "scrub"))
    val scrubbed = docs.filter(col("doc_id") < 300 || col("doc_id") >= 400)
    assert(rows(Classify.readNbCounts(spark, cDir))
      === rows(Classify.nbCounts(scrubbed)),
      "retracted counts diverged from a from-scratch pass on the scrubbed corpus")
    assert(rows(Classify.nbModelFromCounts(Classify.readNbCounts(spark, cDir)))
      === rows(Classify.nbModel(scrubbed)),
      "model packed from retracted counts diverged from a scrubbed-corpus fit")
  }

  test("replay safety both directions: a redelivered ingest batch and a " +
      "redelivered retraction both skip on their writers' watermarks") {
    val cDir = tmp("graft-nb-replay")
    val batch = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    Classify.writeNbCounts(docs.filter(col("doc_id") < 300), cDir)
    assert(Classify.updateNbCountsBatch(spark, cDir, batch, 0L, "ingest"))
    // redelivered ADD skips (would double-count)
    assert(!Classify.updateNbCountsBatch(spark, cDir, batch, 0L, "ingest"))
    assert(Classify.retractNbCountsBatch(spark, cDir, batch, 0L, "scrub"))
    val after = rows(Classify.readNbCounts(spark, cDir))
    // redelivered RETRACTION skips (would double-subtract -> negative)
    assert(!Classify.retractNbCountsBatch(spark, cDir, batch, 0L, "scrub"))
    assert(rows(Classify.readNbCounts(spark, cDir)) === after)
    assert(after === rows(Classify.nbCounts(docs.filter(col("doc_id") < 300))))
  }

  test("retracting a batch that was never added refuses loudly on the " +
      "negative-count guard instead of clamping") {
    val cDir = tmp("graft-nb-negative")
    Classify.writeNbCounts(docs.filter(col("doc_id") < 100), cDir)
    val before = rows(Classify.readNbCounts(spark, cDir))
    val e = intercept[IllegalArgumentException] {
      Classify.retractNbCountsBatch(spark, cDir,
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), 0L, "scrub")
    }
    assert(e.getMessage.contains("NEGATIVE"))
    // the refused retraction left the store serving its prior version
    assert(rows(Classify.readNbCounts(spark, cDir)) === before)
  }

  test("DSIR: add-then-retract == never added; doc-count rows keep the " +
      "target derivation identical to the corpus path") {
    val cDir = tmp("graft-dsir-retract")
    val batch = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    Classify.writeDsirCounts(docs.filter(col("doc_id") < 300), cDir)
    assert(Classify.updateDsirCountsBatch(spark, cDir, batch, 0L, "ingest"))
    assert(Classify.retractDsirCountsBatch(spark, cDir, batch, 0L, "scrub"))
    val scrubbed = docs.filter(col("doc_id") < 300)
    assert(rows(Classify.readDsirCounts(spark, cDir))
      === rows(Classify.dsirCounts(scrubbed)),
      "retracted DSIR counts diverged from a from-scratch pass")
    // packed models serve identically (map entry order is
    // collection-nondeterministic, so equality is on the scored output)
    assert(rows(graft.streaming.DocStream.scoreOnIngest(scrubbed,
        Classify.dsirModelFromCounts(Classify.readDsirCounts(spark, cDir))))
      === rows(graft.streaming.DocStream.scoreOnIngest(scrubbed,
        Classify.dsirModel(scrubbed))),
      "model packed from retracted counts serves differently")
  }

  test("dsirCounts carries bucket=-1 per-source doc counts (r11 ADVICE): a " +
      "source whose docs all tokenize to zero tokens still drives the target") {
    import spark.implicits._
    // 'aaa' would be the min source but its only doc has no tokens —
    // the count-path target must STILL be 'aaa', like dsirModel's
    val planted = Seq(
      (1L, "aaa", ""), // zero tokens after split/filter
      (2L, "bbb", "x y z"),
      (3L, "ccc", "x q")).toDF("doc_id", "source", "text")
    val fromCounts = Classify.dsirModelFromCounts(Classify.dsirCounts(planted))
    val fromDocs = Classify.dsirModel(planted)
    assert(rows(fromCounts.select("target_source"))
      === rows(fromDocs.select("target_source")))
    assert(fromCounts.select("target_source").head.getString(0) == "aaa")
  }

  test("seedFoldedStore refuses to re-seed over a marked store without an " +
      "explicit overwrite (r11 ADVICE: silent watermark reset)") {
    val cDir = tmp("graft-seed-refuse")
    Classify.writeNbCounts(docs.filter(col("doc_id") < 100), cDir)
    val e = intercept[IllegalArgumentException] {
      Classify.writeNbCounts(docs.filter(col("doc_id") < 200), cDir)
    }
    assert(e.getMessage.contains("re-seeding") || e.getMessage.contains("marker-sealed"))
    // the deliberate path still works
    graft.core.Artifacts.seedFoldedStore(
      Classify.nbCounts(docs.filter(col("doc_id") < 200)), cDir, overwrite = true)
    assert(rows(Classify.readNbCounts(spark, cDir))
      === rows(Classify.nbCounts(docs.filter(col("doc_id") < 200))))
  }
}
