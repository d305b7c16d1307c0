package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev utility (r16): per-query Spark-job / stage / task-time census.
  * Per-job scheduling overhead is what a loaded host inflates (PERF.md
  * r15 adjudication), so the job count is the load-independent
  * structural metric behind the wall-clock: a change that deletes jobs
  * is a real win even when the host makes seconds unreadable.
  * Usage: runMain graft.JobCountProbe q_name [q_name ...]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val stageOfTask = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val id = s.stageInfo.stageId
        val prev = stageMs.getOrDefault(id, ("", 0L, 0))
        stageMs.put(id, (s.stageInfo.name.take(120), prev._2, prev._3))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskMs.addAndGet(t.taskInfo.duration)
          val id = t.stageId
          stageMs.merge(id, ("", t.taskInfo.duration, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
      }
    })
    val verbose = sys.env.get("JOB_PROBE_STAGES").exists(_.nonEmpty)

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    args.foreach { n =>
      // warmup (codegen/JIT), outside the census
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"[jobs] $n FAILED: ${e.getMessage}") }
      sweep()
      Thread.sleep(200) // let straggler listener events drain
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L); stageMs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sweep()
      Thread.sleep(300)
      println(f"[jobs] $n%-28s jobs=${jobs.get()}%4d stages=${stages.get()}%4d " +
        f"tasks=${tasks.get()}%5d taskTime=${taskMs.get() / 1000.0}%7.2fs wall=$wall%6.2fs")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        stageMs.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (id, (nm, ms, nt)) =>
            println(f"[stage] $id%5d ${ms / 1000.0}%8.2fs tasks=$nt%4d  $nm")
        }
      }
    }
    spark.stop()
  }
}
