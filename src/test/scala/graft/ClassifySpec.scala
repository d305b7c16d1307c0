package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Classify

/** Behavior tests for the learned-selection operators (DSIR weights,
  * Naive Bayes confusion) beyond what the DuckDB oracle hash pins.
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("dsirWeights: one row per document, exact token totals") {
    val w = Classify.dsirWeights(docs)
    val n = docs.count()
    assert(w.count() === n)
    val totalTokens = w.agg(sum("n_tokens")).head.getLong(0)
    val expected = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    assert(totalTokens === expected)
  }

  test("dsirWeights: target docs average strictly above non-target docs") {
    // the whole point of the importance weight: documents drawn from
    // the target domain must look more target-like than the rest ON
    // AVERAGE (their own tokens shaped the target distribution)
    val w = Classify.dsirWeights(docs)
    val Array(tgtAvg, restAvg) = w
      .groupBy("is_target").agg(avg("weight_per_token").as("a"))
      .orderBy(col("is_target").desc)
      .collect().map(_.getDouble(1))
    assert(tgtAvg > restAvg,
      s"target avg $tgtAvg not above non-target avg $restAvg")
  }

  test("dsirWeights: degenerate target=corpus gives weight exactly 0") {
    // if every doc is the target, p_target == p_raw bucket-for-bucket
    // and every lambda is identically zero — a strong end-to-end check
    // of the smoothing arithmetic (same counts on both sides)
    val one = docs.withColumn("source", lit("only"))
    val w = Classify.dsirWeights(one)
    val mx = w.agg(max(abs(col("weight")))).head.getDouble(0)
    assert(mx === 0.0, s"uniform corpus should weight 0, got max |w| = $mx")
  }

  test("dsirResample: selection shifts the mix toward the target domain") {
    // the corpus is 1/20 target; Gumbel-top-k ∝ exp(w) must over-select
    // target docs (their weights are positive by the avg-separation
    // property above) — the whole point of importance resampling
    val sel = Classify.dsirResample(docs, 50)
    val nTgt = sel.filter(col("is_target") === 1).count()
    assert(sel.count() === 50L)
    assert(nTgt.toDouble / 50.0 > 1.0 / 20.0,
      s"selected target fraction ${nTgt / 50.0} not above the corpus rate 0.05")
  }

  test("nbConfusion: counts cover every held-out doc exactly once") {
    val conf = Classify.nbConfusion(docs)
    val total = conf.agg(sum("n_docs")).head.getLong(0)
    val nTest = docs.filter(graft.ops.Classify.isTest(col("doc_id"))).count()
    assert(total === nTest)
  }

  test("linearQuality: one row per tokenful held-out doc, p in [0,1], threshold consistent") {
    val q = Classify.linearQuality(docs, 3).collect()
    val nOdd = docs.filter(graft.ops.Classify.isTest(col("doc_id"))).count()
    assert(q.length === nOdd)
    q.foreach { r =>
      val p = r.getDouble(5)
      assert(p >= 0.0 && p <= 1.0, s"p_pos $p out of range")
      assert((r.getInt(6) == 1) === (p > 0.5), s"predicted != (p_pos > 0.5): $r")
    }
  }

  test("linear probe: training moved the model off zero") {
    val (_, w, _) = Classify.linearProbeWeights(docs, 3)
    assert(w.exists(_ != 0L), "all weights still zero after 3 rounds")
  }

  test("linear probe separates a disjoint-vocabulary corpus perfectly") {
    // same construction as the NB separability test: sources with
    // disjoint vocab; the held-out half must classify diagonally
    import spark.implicits._
    val sep = (0L until 40L).map { i =>
      val src = if (i % 4 < 2) "a" else "b"
      val word = if (src == "a") "alpha" else "beta"
      (i, s"$word $word$i $word", src)
    }.toDF("doc_id", "text", "source")
    val q = Classify.linearQuality(sep, 3).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getInt(2) === r.getInt(6),
        s"held-out doc ${r.getLong(0)} misclassified: $r")
    }
  }

  test("gateReport: covers the whole corpus; separable corpus gates cleanly by source") {
    val rep = Classify.gateReport(docs, 3)
    assert(rep.agg(sum("n_docs")).head.getLong(0) === docs.count())
    // disjoint-vocab corpus: the gate keeps all of the target source
    // and none of the other
    import spark.implicits._
    val sep = (0L until 40L).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val word = if (src == "a") "alpha" else "beta"
      (i, s"$word $word$i $word", src)
    }.toDF("doc_id", "text", "source")
    val g = Classify.gateReport(sep, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g("a") === 1.0, s"target keep rate ${g("a")} != 1.0")
    assert(g("b") === 0.0, s"non-target keep rate ${g("b")} != 0.0")
  }

  test("nbConfusion: separable corpus classifies perfectly") {
    // two sources with disjoint vocabularies: NB must recover the
    // labels exactly — confusion matrix is diagonal
    import spark.implicits._
    val sep = (0L until 40L).map { i =>
      val src = if (i % 4 < 2) "a" else "b"
      val word = if (src == "a") "alpha" else "beta"
      (i, s"$word $word$i $word", src)
    }.toDF("doc_id", "text", "source")
    val conf = Classify.nbConfusion(sep).collect()
    assert(conf.forall(r => r.getString(0) === r.getString(1)),
      s"off-diagonal predictions: ${conf.mkString(", ")}")
  }
}
