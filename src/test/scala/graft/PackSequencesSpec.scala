package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Sequence packing: the distributed two-phase prefix sum must equal
  * the naive single-window global cumsum exactly, for any bucket width.
  */
class PackSequencesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"
  private def docs = graft.core.Tables.documents(spark, dir)

  private def collectPack(bucketWidth: Int) =
    TextOps.packSequences(docs, 256, bucketWidth)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toList

  test("two-phase prefix sum equals the naive global-window cumsum") {
    val naive = graft.tfidf.TfIdf.tokens(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .withColumn("start_off",
        sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("doc_id"), coalesce(col("start_off"), lit(0L)).as("start_off"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val got = collectPack(100).map(t => (t._1, t._3))
    assert(got === naive)
  }

  test("bucket width does not change the result") {
    assert(collectPack(7) === collectPack(100000))
  }

  test("offsets are contiguous and chunk spans are consistent") {
    val rows = collectPack(100)
    rows.sliding(2).foreach {
      case List((_, n1, s1, _, _, _), (_, _, s2, _, _, _)) =>
        assert(s2 === s1 + n1, "next start_off must be prev start + prev n_tokens")
      case _ =>
    }
    rows.foreach { case (id, n, s, first, last, nc) =>
      assert(first === s / 256, s"doc $id first_chunk")
      assert(last === (s + n - 1) / 256, s"doc $id last_chunk")
      assert(nc === last - first + 1 && nc >= 1, s"doc $id n_chunks")
    }
  }
}
