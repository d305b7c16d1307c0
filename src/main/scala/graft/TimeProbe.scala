package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: wall-clock a declared query (cold + warm) under the
  * bench configuration. Usage: runMain graft.TimeProbe q_name [q_name ...]
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // instant-preserving TIMESTAMP_NTZ normalization (Tables.normalizeTs)
      // requires a UTC session zone — pin it in EVERY entry point, not
      // just Verify, so a non-UTC host cannot shift event instants
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val c0 = SparkEntry.queries(n)(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      // steady = Bench's timed-pass protocol: codegen/JIT warm, but the
      // query pays its own data costs (incl. persist materialization);
      // sweep localCheckpoint blocks too — clearCache() alone leaks them
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val c1 = SparkEntry.queries(n)(spark, dir).count()
      val steady = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      println(f"[time] $n%-28s cold=$cold%8.2fs steady=$steady%8.2fs rows=$c0/$c1")
    }
    spark.stop()
  }
}
