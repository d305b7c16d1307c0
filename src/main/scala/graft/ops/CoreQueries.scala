package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Semantic
import graft.tfidf.TfIdf

/** Reference-parity core queries (SURVEY.md §2) + their DuckDB oracles.
  *
  * Every query is deterministic and hash-stable: total ordering on key
  * columns, floating-point outputs rounded to 9 digits, log base 10 on
  * both sides (SURVEY.md §5.4). The flagship's query term is derived
  * from the data with the same rule on both sides (max df, lexicographic
  * tie-break) so it exists at every scale factor.
  */
object CoreQueries extends graft.QueryModule {

  /** Shared CTE prefix of every oracle: tokenize → counts → totals → df
    * → tfidf, mirroring TfIdf.tfidf exactly (same tokenizer: split on
    * single space, drop empty tokens; m = row count of documents).
    */
  private val tfidfCte: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT doc_id, term, count(*) AS cnt FROM tok WHERE term <> '' GROUP BY doc_id, term),
      |tot AS (SELECT doc_id, sum(cnt) AS doc_total FROM cnt GROUP BY doc_id),
      |dfreq AS (SELECT term, count(*) AS df FROM cnt GROUP BY term),
      |m AS (SELECT count(*) AS m FROM documents),
      |tfidf AS (
      |  SELECT c.doc_id, c.term,
      |         (CAST(c.cnt AS DOUBLE)/CAST(t.doc_total AS DOUBLE)) * log10(CAST(m.m AS DOUBLE)/CAST(d.df AS DOUBLE)) AS tfidf
      |  FROM cnt c JOIN tot t ON c.doc_id=t.doc_id JOIN dfreq d ON c.term=d.term CROSS JOIN m
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_related_terms" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      // tf persisted across the three passes (query-term derivation,
      // norm, aggregation), dropped once the k-row result materializes
      val tf = TfIdf.tfidf(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = Semantic.relatedTermsFrom(tf, Semantic.queryTermFrom(tf), k = 20)
        .localCheckpoint(true)
      tf.unpersist(false)
      out
    },
    "q_tfidf_topk" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      TfIdf.tfidf(docs)
        .select(col("doc_id"), col("term"), round(col("tfidf"), 9).as("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("term"))
        .limit(100)
    },
    "q_term_counts" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      TfIdf.termCounts(docs).orderBy(col("doc_id"), col("term"))
    },
    "q_doc_stats" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      TfIdf.tokens(docs)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("n_terms"))
        .orderBy(col("doc_id"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "q_related_terms" ->
      s"""$tfidfCte,
         |qterm AS (SELECT term FROM dfreq ORDER BY df DESC, term LIMIT 1),
         |qvec AS (SELECT doc_id, tfidf AS v1 FROM tfidf WHERE term = (SELECT term FROM qterm)),
         |den1 AS (SELECT sqrt(sum(v1*v1)) AS d1 FROM qvec),
         |sims AS (
         |  SELECT f.term, sum(coalesce(q.v1, 0.0) * f.tfidf) AS num, sum(f.tfidf*f.tfidf) AS den2
         |  FROM tfidf f LEFT JOIN qvec q ON f.doc_id = q.doc_id
         |  WHERE f.term <> (SELECT term FROM qterm)
         |  GROUP BY f.term
         |)
         |SELECT term, round((num/sqrt(den2)) / (SELECT d1 FROM den1), 9) AS sim
         |FROM sims WHERE num <> 0 ORDER BY sim DESC, term LIMIT 20""".stripMargin,
    "q_tfidf_topk" ->
      s"""$tfidfCte
         |SELECT doc_id, term, round(tfidf, 9) AS tfidf FROM tfidf
         |ORDER BY round(tfidf, 9) DESC, doc_id, term LIMIT 100""".stripMargin,
    "q_term_counts" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id, term, count(*) AS cnt FROM tok WHERE term <> ''
        |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    "q_doc_stats" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_terms
        |FROM tok WHERE term <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
