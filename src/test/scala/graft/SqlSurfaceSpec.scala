package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The engine is reachable from plain SQL: registerAll exposes every
  * testdata table as a view, and a SQL pipeline must agree with its
  * DataFrame twin (they compile to the same plans).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes all ten tables to spark.sql") {
    Tables.registerAll(spark, dir)
    val n = spark.sql(
      """SELECT r_name, count(*) AS n_nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(n.length == 5)
    assert(spark.sql("SELECT count(*) FROM events").head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) == 500)
  }

  test("SQL pipeline == DataFrame twin") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(_.toString)
    val df = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(_.toString)
    assert(sql.sameElements(df))
  }
}
