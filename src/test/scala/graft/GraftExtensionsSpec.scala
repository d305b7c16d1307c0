package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions install path: a session built with the conf
  * gets graft's native functions with no imperative registration call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("builder.withExtensions(new GraftExtensions) installs array_cosine") {
    val base = SparkTestSession.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the running SparkContext but builds a NEW SparkSession.
      // withExtensions is the in-process install path; the equivalent
      // `--conf spark.sql.extensions=graft.GraftExtensions` is a STATIC
      // conf — it only applies when the SparkContext itself is created
      // with it (spark-submit), which a test sharing a context can't do.
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      val r = s.sql(
        "SELECT array_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
        .head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      val ortho = s.sql(
        "SELECT array_cosine(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c")
        .head.getDouble(0)
      assert(ortho == 0.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
