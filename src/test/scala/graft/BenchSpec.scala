package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench must never silently time a broken query as a fast success
  * (r3 verdict: failures were swallowed and benched as good numbers).
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("a failing query records an error flag, a healthy one records none") {
    val (_, ok) = Bench.timeOne(() => spark.range(10).count())
    assert(ok.isEmpty)
    // a realistic breakage: ANSI mode turns bad arithmetic into a
    // runtime throw at action time, exactly what a broken declared
    // query would do under the driver (collect, not count — count()
    // would prune the failing projection away)
    val broken = spark.range(5).selectExpr("10 div (id - 2) AS x")
    val (_, err) = Bench.timeOne(() => broken.collect())
    assert(err.isDefined && err.get.nonEmpty, s"expected an error flag, got $err")
  }
}
