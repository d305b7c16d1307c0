package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** The grid-bucketized interval join (the large-large scale path) must
  * produce exactly the nested-loop join's rows, and must plan as an
  * equi-join, not a BNLJ.
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def ranges = {
    import spark.implicits._
    Seq(("micro", 0.0, 1.0), ("small", 1.0, 30.0), ("medium", 20.0, 80.0),
      ("large", 60.0, 1000.0), ("jumbo", 250.0, 1000.0))
      .toDF("tier", "lo", "hi")
  }

  private def key(r: org.apache.spark.sql.Row) =
    s"${r.getAs[Long]("event_id")}|${r.getAs[String]("tier")}"

  test("bucketized == nested-loop on the tiers data, at several grid widths") {
    val ev = graft.core.Tables.events(spark, dir).select("event_id", "value")
    val bnl = ev.join(ranges, col("value") >= col("lo") && col("value") < col("hi"))
      .collect().map(key).sorted
    assert(bnl.nonEmpty)
    for (w <- Seq(1.0, 10.0, 250.0)) {
      val got = EventOps.intervalJoinBucketed(ev, "value", ranges, "lo", "hi", w)
        .collect().map(key).sorted
      assert(got.sameElements(bnl), s"grid width $w diverges")
    }
  }

  test("bucketized plans as an equi-join on the grid cell (no BNLJ)") {
    val ev = graft.core.Tables.events(spark, dir).select("event_id", "value")
    val p = EventOps.intervalJoinBucketed(ev, "value", ranges, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
