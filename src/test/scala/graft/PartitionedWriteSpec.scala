package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The 100 TB layout story: data written partitioned by a filter column
  * gives partition-PRUNED scans — a `lang = 'en'` query never opens the
  * other languages' files.
  */
class PartitionedWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitionBy(lang) write → PartitionFilters prune the scan to one language") {
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    Tables.documents(spark, dir).write.partitionBy("lang").parquet(out)

    val q = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("isnotnull(lang"), plan)

    // only the en partition directory is actually read
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.mkString("\n"))

    val n = q.count()
    val expected = Tables.documents(spark, dir).filter(col("lang") === "en").count()
    assert(n == expected)
  }
}
