package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin == plain inner join (same rows, any salt distribution)") {
    val o = Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey")
    val c = Tables.customer(spark, dir)
    val plain = o.join(c, Seq("c_custkey"))
    val salted = Skew.saltedJoin(o, c, "c_custkey", saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val a = plain.select("o_orderkey", "c_name").collect().map(_.toString).sorted
    val b = salted.select("o_orderkey", "c_name").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
