package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every declared query at the harness-provided
  * scale factor.
  *
  * Methodology (steady-state, JMH-style): one untimed warmup pass runs
  * each query once — paying session init, whole-stage-codegen class
  * compilation, and JIT once, outside the measurement — then every
  * cached table is dropped so the timed pass pays each query's real
  * data costs (scans, shuffles, its own persist materializations).
  * Between queries ALL leftover persistent RDDs are dropped, not just
  * catalog-cached tables: the sketch entry points localCheckpoint their
  * bounded outputs, and `catalog.clearCache()` does not free
  * localCheckpoint block storage — without the explicit sweep ~76
  * queries × 2 passes accumulate executor storage and the run degrades
  * into GC churn (the r3 run-to-run variance).
  *
  * Output contract: the harness captures a bounded tail of stdout and
  * parses its LAST line, so the last line must be short. Per-query
  * detail goes out first (and to bench_results.json when the working
  * directory is writable); the final line is a compact total.
  */
object Bench {

  /** Time one query action; a failure is REPORTED, never silently timed
    * as a fast success (a broken query used to bench as a great number).
    */
  private[graft] def timeOne(run: () => Unit): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err = try { run(); None } catch {
      case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
    }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf, default 100: the suite's ~76 queries × several
      // codegen stages each overflow that between the warmup and timed
      // passes, so every timed query would recompile its generated code
      // — the warmup only pays off if the cache can hold the suite
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Drop every leftover persisted RDD: catalog caches AND the
    // localCheckpoint blocks the sketch entry points leave behind
    // (their returned frames are bounded, but the blocks outlive the
    // query and clearCache alone never frees them).
    def dropAllStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      dropAllStorage()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (dt, err) = timeOne(() => fn(spark, sfDir).count())
      dropAllStorage()
      (name, dt, err)
    }.toSeq

    val (full, summary) = render(results, sfDir)
    // full detail for humans/judges — file is best-effort, stdout first
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_results.json"), full)
    catch { case _: Throwable => () }
    println(full)
    // the LAST line is the one the harness parses — keep it short
    println(summary)
    spark.stop()
  }

  /** (full detail JSON, short summary JSON). The summary is printed
    * LAST and must stay well under the harness's ~2k-char stdout-tail
    * window regardless of suite size — BenchSpec pins both lines as
    * parseable JSON and the summary as bounded (the contract whose
    * violation recorded parsed:null for three rounds).
    */
  private[graft] def render(results: Seq[(String, Double, Option[String])],
      sfDir: String): (String, String) = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val head =
      s""""metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${results.count(_._3.isDefined)}"""
    (s"""{$head,"queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}""",
      s"""{$head,"sf":${jstr(sfDir)}}""")
  }
}
