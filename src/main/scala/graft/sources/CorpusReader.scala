package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the reference's native corpus format: a text file with
  * one document per line, first whitespace token = document id, rest =
  * terms (/root/reference/app.py:11-15,119-121).
  *
  * Unlike the reference — which collects every line to the driver and
  * tokenizes in a Python loop (app.py:10-17) — this is a distributed
  * `spark.read.text` scan plus two narrow projections: it never leaves
  * the executors and splits across however many partitions the file
  * has blocks.
  *
  * Divergences (documented, FIXTURES.md A.3): blank lines become
  * documents with empty text instead of crashing; non-ASCII text passes
  * through as UTF-8 instead of the reference's lossy ascii fold.
  */
object CorpusReader {

  /** Read a corpus text file into the engine's canonical
    * (doc_id string, text string) shape.
    *
    * @param asciiFold reproduce the reference's py2 lossy
    *   `encode("ascii","ignore")` (app.py:124): drop every non-ASCII
    *   character. Off by default — UTF-8 passthrough is the documented
    *   divergence; on for strict reference parity.
    */
  def readCorpus(spark: SparkSession, path: String, asciiFold: Boolean = false): DataFrame = {
    val raw = spark.read.text(path)
    val base = if (asciiFold)
      raw.select(regexp_replace(col("value"), "[^\\x00-\\x7F]", "").as("value"))
    else raw
    base.select(
      substring_index(col("value"), " ", 1).as("doc_id"),
      // everything after the first token; empty when the line has
      // no separator at all (single-token or blank lines)
      when(instr(col("value"), " ") > 0,
        expr("substring(value, instr(value, ' ') + 1)"))
        .otherwise(lit("")).as("text"))
  }

  /** The same corpus as one row per token occurrence. */
  def tokens(spark: SparkSession, path: String): DataFrame =
    graft.tfidf.TfIdf.tokens(readCorpus(spark, path))
}
