package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps

/** The k-means IVF trainer: determinism and that training actually
  * tightens the clustering vs the naive lowest-id centroids.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"
  private def emb = graft.core.Tables.embeddings(spark, dir)

  test("deterministic across runs") {
    def run() = VectorOps.kmeans(emb, k = 8, iters = 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList)).sortBy(_._1).toList
    assert(run() === run())
  }

  test("trained centroids beat the lowest-id stand-ins on mean best-cosine") {
    val naive = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").cast("array<double>").as("cid_v"))
    val trained = VectorOps.kmeans(emb, k = 8, iters = 5)
    val qNaive = VectorOps.assignmentQuality(emb, naive)
    val qTrained = VectorOps.assignmentQuality(emb, trained)
    assert(qTrained > qNaive,
      s"trained $qTrained should exceed naive $qNaive")
  }

  test("produces exactly k centroids of the input dimension") {
    val cent = VectorOps.kmeans(emb, k = 5, iters = 2).collect()
    assert(cent.length == 5)
    assert(cent.forall(_.getSeq[Double](1).length == 64))
  }

  test("lshSearch: deterministic, bucket-consistent, returns ranked neighbors") {
    def run() = VectorOps.lshSearch(emb, col("vid") >= 495, 4, 64, 5)
      .collect().map(_.toString).sorted.toList
    val a = run()
    assert(a == run(), "LSH index must be reproducible")
    val rows = VectorOps.lshSearch(emb, col("vid") >= 495, 4, 64, 5).collect()
    assert(rows.nonEmpty)
    // every neighbor shares the query's bucket and ranks are 1..k dense
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length == 1)
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
    }
  }

  test("centroids are unit-norm (spherical update)") {
    val cent = VectorOps.kmeans(emb, k = 8, iters = 3).collect()
    cent.foreach { r =>
      val n = math.sqrt(r.getSeq[Double](1).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid ${r.getInt(0)} norm $n")
    }
  }
}
