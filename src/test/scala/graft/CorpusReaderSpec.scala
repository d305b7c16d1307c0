package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusReader

class CorpusReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def write(lines: String*): String = {
    val p = Files.createTempFile("graft-corpus", ".txt")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("reference format: first token is doc_id, rest is text") {
    val path = write("d1 alpha beta", "d2 gamma", "d3")
    val rows = CorpusReader.readCorpus(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("d1", "alpha beta"), ("d2", "gamma"), ("d3", "")))
  }

  test("asciiFold reproduces the reference's lossy py2 encode (drop non-ASCII)") {
    val path = write("d1 café naïve beta", "d2 中文 ok")
    val folded = CorpusReader.readCorpus(spark, path, asciiFold = true)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(folded.toSeq == Seq(("d1", "caf nave beta"), ("d2", " ok")))
    // default: UTF-8 passthrough (documented divergence)
    val raw = CorpusReader.readCorpus(spark, path)
      .collect().map(_.getString(1)).sorted
    assert(raw.contains("café naïve beta"))
  }
}
