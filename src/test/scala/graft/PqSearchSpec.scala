package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Behavior tests for the product-quantization ADC search beyond the
  * oracle hash: codebook self-encoding exactness and measured recall
  * against the exact dot-product ranking.
  */
class PqSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("a codebook constituent's ADC score equals its exact quantized dot") {
    // vectors 0..15 ARE the codewords, so each encodes to itself in
    // every subspace, its PQ reconstruction is itself, and ADC against
    // any query must equal the grid-quantized exact dot product — the
    // zero-quantization-error corner pins the whole encode+LUT+fold
    // path
    val adc = VectorOps.pqSearch(emb, col("vec_id") < 5, 8, 16, 500, 64)
      .filter(col("vid") < 16)
      .select("qid", "vid", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for (q <- 0L until 5L; v <- 0L until 16L if q != v) {
      val exact = vecs(q).zip(vecs(v))
        .map { case (a, b) => math.floor(a * b * 1e12 + 0.5).toLong }.sum / 1e12
      assert(adc((q, v)) === exact, s"ADC(q=$q, v=$v) != exact quantized dot")
    }
  }

  test("pqSearch refuses a codebook too large to inline (r14 ADVICE): " +
      "a ksub=256 configuration points at the broadcast-join IVFADC path") {
    // default config sits well inside the budget
    assert(8 * 16 * 8 <= VectorOps.PqInlineLiteralBudget)
    // a realistic production codebook (ksub=256, m=8, sub=8 -> 16384
    // literal doubles) must refuse loudly BEFORE building the plan —
    // Janino 64KB fallback / analyzer blowup territory
    val e = intercept[IllegalArgumentException] {
      VectorOps.pqSearch(emb, col("vec_id") < 5, 8, 256, 10, 64)
    }
    assert(e.getMessage.contains("writeIvfPqIndex"), e.getMessage)
  }

  test("ADC top-10 keeps useful overlap with the exact dot-product top-10") {
    // 16 codewords x 8 subspaces on isotropic random vectors is the
    // WORST case for PQ (no cluster structure to quantize onto), like
    // the LSH overlap measurements in PERF.md — the assertion pins a
    // non-collapsing floor, not production recall
    val exact = emb.as("q").filter(col("q.vec_id") < 5)
      .crossJoin(emb.as("c")).filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vid"),
        aggregate(zip_with(col("q.embedding").cast("array<double>"),
            col("c.embedding").cast("array<double>"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dot").desc, col("vid"))
    val exactTop = exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcTop = VectorOps.pqSearch(emb, col("vec_id") < 5, 8, 16, 10, 64)
      .select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (exactTop intersect adcTop).size.toDouble / exactTop.size
    info(f"PQ top-10 overlap vs exact dot: $overlap%.2f")
    assert(overlap >= 0.1, s"PQ recall collapsed: $overlap")
  }

  test("trained codebook has exactly m x ksub codewords with dense 0-based cids") {
    val cb = VectorOps.pqTrain(emb, 8, 16, 2, 64).collect()
    assert(cb.length == 8 * 16)
    val byJ = cb.groupBy(_.getInt(0))
    assert(byJ.keySet == (0 until 8).toSet)
    // the flattened LUT layout (entry j*ksub + code) REQUIRES this
    byJ.values.foreach(rows => assert(rows.map(_.getInt(1)).toSet == (0 until 16).toSet))
    cb.foreach(r => assert(r.getSeq[Double](2).length == 8))
  }

  test("PQ shortlist + exact re-rank recovers the true cosine top-10 (overlap >= 0.9)") {
    // the deployment answer to raw ADC's isotropic worst case: the
    // trained-ADC shortlist (top-100) only has to RETAIN the true
    // neighbors; the exact cosine pass re-ranks them — measured, not
    // asserted-by-construction (VERDICT r7 #1's done-gate)
    val truth = VectorOps.knn(emb, col("vec_id") < 5, 10)
      .select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = VectorOps
      .pqSearchRerank(emb, col("vec_id") < 5, 8, 16, 100, 10, 64,
        Some(VectorOps.pqTrain(emb, 8, 16, 2, 64)))
      .select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (truth intersect rr).size.toDouble / truth.size
    info(f"re-ranked top-10 overlap vs exact cosine: $overlap%.2f")
    assert(overlap >= 0.9, s"re-ranked recall below the done-gate: $overlap")
  }

  test("ivfPqSearch: results stay in the query's cell with descending scores") {
    val out = VectorOps.ivfPqSearch(emb, col("vid") < 5, 8, 8, 16, 10, 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // one cell per query, ranks dense from 1, scores non-increasing —
    // the invariants the composition must keep regardless of data
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).distinct.length == 1, s"query $q spans cells")
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rows.length), s"ranks not dense for $q")
      sorted.map(_._5).toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0) >= pair(1), s"scores not descending for $q")
      }
      rows.foreach(r => assert(r._4 != q, s"self-pair for $q"))
    }
  }

  test("hash-sampled codebook training preserves the re-rank recall story") {
    // the 100 TB training mode: fit the codebook on a 30% deterministic
    // sample, encode and search the FULL corpus — recall must stay in
    // the same band as full-corpus training (codebooks need statistics,
    // not the whole corpus)
    val truth = VectorOps.knn(emb, col("vec_id") < 5, 10)
      .select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = VectorOps
      .pqSearchRerank(emb, col("vec_id") < 5, 8, 16, 100, 10, 64,
        Some(VectorOps.pqTrain(emb, 8, 16, 2, 64, samplePct = 30)))
      .select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (truth intersect rr).size.toDouble / truth.size
    info(f"sampled-codebook re-ranked overlap: $overlap%.2f")
    assert(overlap >= 0.8, s"sampled-codebook recall collapsed: $overlap")
  }
}
