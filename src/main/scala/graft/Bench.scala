package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every declared query at the harness-provided
  * scale factor and prints one JSON line.
  *
  * Methodology (steady-state, JMH-style): one untimed warmup pass runs
  * each query once — paying session init, whole-stage-codegen class
  * compilation, and JIT once, outside the measurement — then every
  * cached table is dropped so the timed pass pays each query's real
  * data costs (scans, shuffles, its own persist materializations).
  * Caches are also cleared between timed queries: persisted sketch
  * tables are per-query working state and must not leak memory (or
  * results) into the next query's measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf, default 100: the suite's ~65 queries × several
      // codegen stages each overflow that between the warmup and timed
      // passes, so every timed query would recompile its generated code
      // — the warmup only pays off if the cache can hold the suite
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // let AQE coalesce small shuffles below the advisory size instead
      // of fanning every tiny exchange out to #cores tasks (the Spark
      // tuning guide's own recommendation); large stages keep their
      // parallelism, so this only trims task-scheduling overhead
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
