package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Semantic
import graft.tfidf.TfIdf

/** Reference-parity golden fixtures (FIXTURES.md §A): observed outputs
  * of the reference program on the 5-document corpus, hand-verified
  * against the formulas in SURVEY.md §2.3.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus(lines: (String, String)*) = {
    import spark.implicits._
    lines.toDF("doc_id", "text")
  }

  private val golden = corpus(
    "d1" -> "gene_egfr_gene gene_kras_gene apple",
    "d2" -> "gene_egfr_gene gene_egfr_gene gene_tp53_gene banana",
    "d3" -> "gene_kras_gene apple banana",
    "d4" -> "gene_egfr_gene gene_tp53_gene gene_tp53_gene",
    "d5" -> "apple banana cherry")

  private def related(query: String): Seq[(String, Double)] =
    Semantic.relatedTerms(golden, query, k = 5, termPred = Some(Semantic.geneTermPredicate))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("golden: query gene_egfr_gene → tp53 then kras (FIXTURES A.2)") {
    val got = related("gene_egfr_gene")
    assert(got.map(_._1) == Seq("gene_tp53_gene", "gene_kras_gene"))
    assert(math.abs(got(0)._2 - 0.7096661947545744) < 1e-8)
    assert(math.abs(got(1)._2 - 0.34299717028501764) < 1e-8)
  }

  test("golden: query gene_tp53_gene → egfr only (kras sim 0 filtered)") {
    val got = related("gene_tp53_gene")
    assert(got.map(_._1) == Seq("gene_egfr_gene"))
    assert(math.abs(got(0)._2 - 0.7096661947545744) < 1e-8)
  }

  test("golden: symmetry sim(kras→egfr) == sim(egfr→kras)") {
    val got = related("gene_kras_gene")
    assert(got.map(_._1) == Seq("gene_egfr_gene"))
    assert(math.abs(got(0)._2 - 0.34299717028501764) < 1e-8)
  }

  test("golden: nonexistent query term → empty result, no error") {
    assert(related("gene_nonexistent_gene").isEmpty)
  }

  test("edge: duplicate doc id pools counts but m stays the line count (FIXTURES A.3)") {
    val c = corpus(
      "d1" -> "gene_egfr_gene apple",
      "d1" -> "gene_egfr_gene banana",
      "d2" -> "gene_kras_gene gene_egfr_gene")
    val got = Semantic.relatedTerms(c, "gene_egfr_gene", k = 5,
        termPred = Some(Semantic.geneTermPredicate))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == Seq("gene_kras_gene"))
    assert(math.abs(got(0)._2 - 0.7071067811865476) < 1e-8)
  }

  test("edge: blank documents are dropped from tokens but count toward m") {
    val c = corpus("d1" -> "a b", "d2" -> "", "d3" -> "a c")
    assert(TfIdf.tokens(c).count() == 4)
    // m = 3 (row count): idf(a) = log10(3/2) ≠ 0, so 'a' survives.
    val tf = TfIdf.tfidf(c)
    val idfA = tf.filter(org.apache.spark.sql.functions.col("term") === "a")
      .select("tfidf").collect().map(_.getDouble(0))
    assert(idfA.forall(v => math.abs(v - 0.5 * math.log10(1.5)) < 1e-12))
  }

  test("shuffled-join fallback (broadcastQuery=false) gives identical results") {
    // the stop-word escape hatch for queries whose vector would exceed
    // broadcast limits at extreme scale — must be result-identical
    val a = Semantic.relatedTerms(golden, "gene_egfr_gene", k = 5,
      termPred = Some(Semantic.geneTermPredicate), broadcastQuery = true)
      .collect().map(_.toString).toSeq
    val b = Semantic.relatedTerms(golden, "gene_egfr_gene", k = 5,
      termPred = Some(Semantic.geneTermPredicate), broadcastQuery = false)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("tfidf table shape: one row per (doc, term), df and totals correct") {
    val tf = TfIdf.tfidf(golden).collect()
    assert(tf.length == 14)
    val egfrD2 = tf.find(r => r.getString(0) == "d2" && r.getString(1) == "gene_egfr_gene").get
    assert(egfrD2.getLong(2) == 2L)       // cnt
    assert(egfrD2.getLong(3) == 4L)       // doc_total (ALL tokens incl banana)
    assert(egfrD2.getLong(4) == 3L)       // df: d1 d2 d4
    assert(math.abs(egfrD2.getDouble(5) - 0.5 * math.log10(5.0 / 3.0)) < 1e-12)
  }
}
