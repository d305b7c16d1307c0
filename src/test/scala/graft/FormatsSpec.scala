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

  test("CSV round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("csv", Formats.writeCsv, (p, s) => Formats.readCsv(spark, p, s))
  }

  test("JSON round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("json", Formats.writeJson, (p, s) => Formats.readJson(spark, p, s))
  }
}
