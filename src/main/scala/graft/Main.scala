package graft

import org.apache.spark.sql.SparkSession

import graft.sim.Semantic
import graft.sources.CorpusReader

/** Drop-in CLI for the reference program (app.py): given a corpus text
  * file (one doc per line, first token = doc id) and a query term,
  * print the top-5 most similar terms in the reference's padded format
  * (app.py:176-179).
  *
  * Usage: runMain graft.Main <corpus.txt> <query_term> [k] [--gene-filter]
  *
  * `--gene-filter` applies the reference's hard-coded gene_*_gene term
  * predicate (app.py:145); without it all terms are candidates.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <corpus.txt> <query_term> [k] [--gene-filter]")
      sys.exit(2)
    }
    val path = args(0)
    val query = args(1)
    val k = args.drop(2).flatMap(_.toIntOption).headOption.getOrElse(5)
    val geneFilter = args.contains("--gene-filter")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-related-terms")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.ui.enabled", "false")
      // instant-preserving TIMESTAMP_NTZ normalization (Tables.normalizeTs)
      // requires a UTC session zone — pin it in EVERY entry point, not
      // just Verify, so a non-UTC host cannot shift event instants
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = CorpusReader.readCorpus(spark, path)
    val pred = if (geneFilter) Some(Semantic.geneTermPredicate) else None
    val top = Semantic.relatedTerms(docs, query, k = k, termPred = pred,
      roundDigits = -1).collect()
    top.foreach(r => println(f"${r.getString(0)}%-50s${r.getDouble(1)}"))
    spark.stop()
  }
}
