package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump physical plans of selected declared queries for
  * scale review (pushdown / broadcast / codegen / top-k checks).
  * Usage: runMain graft.PerfProbe q_name [q_name ...]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // instant-preserving TIMESTAMP_NTZ normalization (Tables.normalizeTs)
      // requires a UTC session zone — pin it in EVERY entry point, not
      // just Verify, so a non-UTC host cannot shift event instants
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pricing_summary")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
