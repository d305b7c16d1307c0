package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def roundtrips(name: String, write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: (String, org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame): Unit = {
    val src = Tables.lineitem(spark, dir)
    val tmp = Files.createTempDirectory(s"graft-$name").toString + "/t"
    write(src, tmp)
    val back = read(tmp, src.schema)
    assert(back.schema == src.schema, s"$name schema drift")
    val a = src.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b), s"$name value drift")
  }

  test("compactParquet merges a fragmented table into few sorted files, data intact") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    val src = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val frag = java.nio.file.Files.createTempDirectory("frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("compact").toString
    src.repartition(64).write.mode("overwrite").parquet(frag) // 64 tiny files
    Formats.compactParquet(spark, frag, compacted, targetMB = 128,
      sortCols = Seq("l_orderkey", "l_linenumber"))
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 64)
    assert(parquetFiles(compacted) <= 4, s"expected few files, got ${parquetFiles(compacted)}")
    val a = spark.read.parquet(frag).orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString)
    val b = spark.read.parquet(compacted).orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("CSV round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("csv", Formats.writeCsv, (p, s) => Formats.readCsv(spark, p, s))
  }

  test("JSON round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("json", Formats.writeJson, (p, s) => Formats.readJson(spark, p, s))
  }

  test("schema evolution: mergeSchema unions parquet batches with added columns") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val v2 = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag") // column added later
    v1.write.parquet(s"$base/batch=1")
    v2.write.parquet(s"$base/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("l_orderkey", "l_quantity", "l_returnflag", "batch"))
    // old rows surface the new column as null; no rows lost
    assert(merged.count() == v1.count() + v2.count())
    assert(merged.filter(col("batch") === 1 && col("l_returnflag").isNotNull).count() == 0)
  }

  test("ORC round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("orc", Formats.writeOrc, (p, s) => Formats.readOrc(spark, p, s))
  }

  test("ORC scan gets pushdown: filter reaches the reader as a search argument") {
    val src = Tables.lineitem(spark, dir)
    val tmp = Files.createTempDirectory("graft-orc-pushdown").toString + "/t"
    Formats.writeOrc(src, tmp)
    val plan = Formats.readOrc(spark, tmp, src.schema)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === 1L)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"), plan)
  }
}
