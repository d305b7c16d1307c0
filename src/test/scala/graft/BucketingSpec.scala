package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Demonstrates the co-located join path for 100 TB fact-fact joins:
  * writing both sides bucketed by the join key lets Spark plan a
  * SortMergeJoin with ZERO Exchange operators — the shuffle happened
  * once at write time and is amortized over every later join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join with no Exchange in the plan") {
    // warehouse.dir is a static conf; managed tables land in the default
    // ./spark-warehouse (gitignored) and are dropped at the end
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables.lineitem(spark, dir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, dir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // bucketed join must not broadcast (that would bypass the point)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // both scans read bucketed data, and the join itself needs no
      // exchange — the only one allowed is for the groupBy on the
      // different key (o_orderstatus) after the join
      assert(plan.split("Bucketed: true").length == 3, s"expected 2 bucketed scans:\n$plan")
      val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(exchanges == Seq("o_orderstatus"),
        s"only the post-join aggregate may shuffle, got $exchanges:\n$plan")

      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val plain = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
