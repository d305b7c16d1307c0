package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The reason bigram NLL exists next to unigram NLL: it is
  * order-sensitive where the unigram score is a pure bag-of-words.
  */
class BigramNllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("scrambled word order moves bigram NLL but not unigram NLL") {
    import spark.implicits._
    // docs 1-3 establish the corpus's dominant bigrams; doc 4 is
    // fluent under them, doc 5 is the SAME token multiset as doc 4
    // with the order scrambled to break every dominant bigram
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the box"),
      (4L, "the cat sat on the mat"),
      (5L, "mat the on sat cat the")
    ).toDF("doc_id", "text")

    val uni = TextOps.unigramNll(docs)
      .select("doc_id", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(4L) === uni(5L),
      "unigram NLL must be order-blind: same multiset, same score")

    val big = TextOps.bigramNll(docs)
      .select("doc_id", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(big(4L) < big(5L),
      s"fluent doc must score below its scrambled twin: ${big(4L)} vs ${big(5L)}")
  }

  test("every multi-token document gets a row; bigram count = tokens - 1") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextOps.bigramNll(docs)
    assert(out.count() === docs.count())
    val bad = out
      .join(TextOps.tokenStats(docs).select("doc_id", "n_tokens"), "doc_id")
      .filter(col("n_bigrams") =!= col("n_tokens") - 1)
    assert(bad.count() === 0L)
  }
}
