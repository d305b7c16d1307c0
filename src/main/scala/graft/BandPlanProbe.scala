package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r17): plan-shape A/B of the minhash band projection —
  * the r16 NBANDS-way union-of-selects vs the r17 single posexplode
  * generate — over the same signature pipeline. The declared consumers
  * checkpoint eagerly and explain as `Scan ExistingRDD`, so this probe
  * is the committed plan evidence for the band-projection rewrite
  * (plans/r17/band_projection_{union,generate}.txt).
  */
object BandPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val sigs = graft.ops.Dedup.minhashSignatures(docs)
    val P = 4294967311L
    val nBands = 4

    println("\n===== band_projection_union (r16 shape) =====")
    (0 until nBands).map { bnd =>
      sigs.select(
        col("doc_id"), lit(bnd).as("band"),
        (col(s"sig${2 * bnd}") * lit(P) + col(s"sig${2 * bnd + 1}")).as("bkey"))
    }.reduce(_ union _)
      .groupBy("band", "bkey").agg(count(lit(1)).as("occ"))
      .explain("formatted")

    println("\n===== band_projection_generate (r17 shape) =====")
    sigs.select(col("doc_id"),
      posexplode(array((0 until nBands).map(bnd =>
        col(s"sig${2 * bnd}") * lit(P) + col(s"sig${2 * bnd + 1}")): _*))
        .as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("occ"))
      .explain("formatted")
    spark.stop()
  }
}
