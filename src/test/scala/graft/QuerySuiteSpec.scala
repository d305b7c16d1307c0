package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001 (the correctness gate
  * proper is the DuckDB oracle at sf0.01 — tools/oracle_check.py).
  * Also asserts the oracle-coverage invariant: each oracleSql key has a
  * query, and runs are deterministic (two executions, same result).
  */
class QuerySuiteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 and is deterministic") {
      val a = fn(spark, dir).collect()
      val b = fn(spark, dir).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, s"$name not deterministic")
    }
  }
}
