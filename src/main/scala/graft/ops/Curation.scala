package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.Shingles

/** The end-to-end curation pipeline as ONE declared, oracle-checked
  * query — so the driver's hash gate covers the COMPOSITION of the
  * stages, not just each stage in isolation (stage queries can all be
  * green while a pipeline wiring bug — wrong corpus fed to the vocab,
  * drop set applied before decontamination — silently ships bad
  * training data). Mirrors `graft.PipelineDemo`'s chain:
  *
  *   quality gate (>= 0.5) → decontaminate vs probe docs (doc_id < 3)
  *   → minhash/LSH candidates → connected components → quality-argmax
  *   canonical per cluster → reproducible shuffle rank → vocab-id
  *   encoding → deterministic 80/10/10 split
  *
  * One deliberate divergence from the demo, documented here: the
  * keep-best stage reuses the STEP-1 quality scores (one corpus pass)
  * instead of recomputing quality — with its own stopword top-k — over
  * the post-filter subset. At 100 TB a second full quality pass for
  * the same decision is a wasted corpus scan; the demo's header
  * already describes the reuse semantics, and the oracle pins them.
  *
  * Scale shape: every stage is the declared operator's own shape (scan
  * aggregates, banded LSH shuffle, O(log d) CC rounds, two-phase rank,
  * broadcast vocab); the composition adds only broadcast semi/anti
  * joins of id sets, so the corpus text is never shuffled and nothing
  * is materialized on the driver. The 3-shingle stream over the gated
  * corpus is materialized ONCE and feeds both decontamination and the
  * minhash sketch ([[TextOps.contaminationFromShingles]] /
  * [[Dedup.minhashSignaturesFromShingles]]) — the per-doc lead-window
  * shingle pass is the dominant text cost at 100 TB, and running it
  * per-stage would double it.
  */
object Curation extends graft.QueryModule {

  /** (doc_id, split, shuffle_pos, n_tokens, n_oov, ids_md5) for every
    * document that survives gate → decontaminate → dedup; the narrow,
    * deterministic projection of the training set a trainer would read
    * (ids_md5 pins every token id and its position).
    */
  def curatedTrainingSet(docs: DataFrame): DataFrame = {
    // step-1 scores, computed once and reused by the keep-best argmax
    val quality = TextOps.qualityScores(docs)
      .select(col("doc_id"), col("quality"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gated = docs
      .join(quality.filter(col("quality") >= 0.5).select("doc_id"), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE shingle pass over the gated corpus (tokenize + per-doc lead
    // window — the dominant text-pass cost at 100 TB) feeds BOTH the
    // decontamination probe join and the minhash sketch; before this
    // reuse each stage ran its own full pass over ~the same documents.
    val gatedShingles = graft.text.Shingles.shingles(gated, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contaminated = TextOps
      .contaminationFromShingles(
        gatedShingles.filter(col("doc_id") >= 3), docs.filter(col("doc_id") < 3), 3)
      .filter(col("n_hits") >= 3)
      .select("doc_id")
    val clean = gated
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleanShingles = gatedShingles
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")

    val clusters = Dedup.clustersFromCandidates(
      Dedup.candidatesFromSignatures(Dedup.minhashSignaturesFromShingles(cleanShingles), 0.5))
    val best = Dedup.keepBestPerCluster(clusters, quality)
    val dropSet = clusters
      .join(best.select(col("keep_doc_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select("doc_id")
    val kept = clean
      .join(broadcast(dropSet), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val out = kept.select("doc_id")
      .join(TextOps.shuffleRank(kept).select("doc_id", "shuffle_pos"), Seq("doc_id"))
      .join(TextOps.encodeTokens(kept, 20), Seq("doc_id"))
      .withColumn("split",
        when(TextOps.hashBucket(col("doc_id")) < 80, "train")
          .when(TextOps.hashBucket(col("doc_id")) < 90, "valid")
          .otherwise("test"))
      .select("doc_id", "split", "shuffle_pos", "n_tokens", "n_oov", "ids_md5")
      .localCheckpoint(true)
    Seq(quality, gated, gatedShingles, clean, kept).foreach(_.unpersist(false))
    out
  }

  /** Leakage-safe train/valid/test split: a near-dup CLUSTER is the
    * unit of assignment, not the document — doc-hash splitting puts
    * two near-identical documents in train and test with probability
    * 2·p·(1−p) each, and the eval set silently overlaps the training
    * data (the standard contamination bug cluster-aware splitting
    * exists to prevent; same reason GroupKFold exists). The split key
    * is the cluster label (min doc_id) for clustered docs and the
    * doc's own id otherwise, pushed through the same engine-portable
    * md5 bucket as q_train_split, so every member of a cluster lands
    * in the same split BY CONSTRUCTION — spec-asserted, and the
    * per-doc output (not a 3-row aggregate) keeps the oracle
    * discriminating. Cost at 100 TB: the cluster chain (already the
    * declared q_dedup_clusters path) + one doc_id-keyed equi-join of
    * two id tables and a stateless hash — no hint, because on a
    * dup-heavy web corpus the cluster table is a large FRACTION of
    * the corpus, not a broadcastable dimension; AQE picks the join.
    */
  def leakageSafeSplit(docs: DataFrame): DataFrame = {
    val clusters = Dedup.dupClusters(docs, 0.5).select("doc_id", "cluster_id")
    val bucket = TextOps.hashBucket(col("split_key"))
    docs.select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
      .select("doc_id", "split_key", "split")
  }

  /** Per-source dataset card — the corpus report a curation run
    * publishes with a release (cf. "Datasheets for Datasets", Gebru et
    * al. 2021): doc/token/char volumes, exact-duplicate counts,
    * language diversity (count, mode, Shannon entropy in nats). One
    * row per source.
    *
    * Scale shape: two doc-keyed aggregates (token counts, md5 copy
    * counts) joined back on their own keys, then per-(source,lang)
    * counts — a table bounded by sources × languages, on which the
    * entropy window and mode argmax are free at any corpus size. The
    * entropy terms quantize to DECIMAL(28,6) before the exact sum (the
    * cross-engine pattern); the mode breaks ties toward the
    * lexicographically smallest language.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokPerDoc = graft.tfidf.TfIdf.tokens(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val copies = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_copies"))
    val docAgg = docs.withColumn("h", md5(col("text")))
      .join(copies, "h")
      .join(tokPerDoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_toks"), lit(0L))).as("n_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    val perLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("nl"))
    val p = col("nl").cast("double") / col("tot").cast("double")
    val langAgg = perLang
      .withColumn("tot", sum(col("nl")).over(Window.partitionBy("source")))
      .withColumn("hterm",
        (-(p * log(p))).cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_langs"),
        min(struct((-col("nl")).as("neg"), col("lang").as("lang"))).as("top"),
        sum(col("hterm")).as("hsum"))
      .select(col("source"), col("n_langs"), col("top.lang").as("top_lang"),
        col("hsum").cast("double").as("lang_entropy"))
    docAgg.join(langAgg, "source")
  }

  /** Snapshot diff between two corpus versions — the ingest regression
    * detector a daily pipeline runs before promoting a new crawl:
    * per-source added / removed / changed / unchanged document counts,
    * change detected by content hash. One full-outer join on doc_id
    * carrying only (source, md5) — the corpus text itself never
    * shuffles, so the diff costs two narrow scans at any corpus size.
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), col("source").as("src1"),
      md5(col("text")).as("h1"))
    val b = v2.select(col("doc_id"), col("source").as("src2"),
      md5(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src2"), col("src1")).as("source"),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source")
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** Per-source term-distribution drift between two snapshots (r9
    * verdict #7) — the ingest-regression NUMBER an operator alerts on,
    * where [[corpusDiff]] counts documents: total variation between
    * the snapshots' term frequencies over the union of their per-
    * source top-`topK` terms, plus the single most-drifted term. A
    * boilerplate injection, a language flip, or a template change in
    * one source moves this number the day it happens, before any
    * downstream metric does.
    *
    * Exactness: frequencies quantize to exact micro-longs
    * (cnt·1e6 DIV total — integer floor division, identical in both
    * engines), so TV and the argmax term sit behind the full hash
    * gate. Scale shape: ONE token aggregate per snapshot (the pass a
    * stats job runs anyway), per-source windows over the vocab-sized
    * frequency frame, and one (source, term)-keyed full-outer join of
    * the two frequency tables — the corpus text never shuffles and
    * nothing self-joins. Support = union of both top-k sets, with
    * each term's TRUE frequency from both sides (a term that fell out
    * of one snapshot's top-k still contributes its real probability,
    * not zero).
    */
  def corpusDrift(v1: DataFrame, v2: DataFrame, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def freqs(v: DataFrame, sfx: String): DataFrame =
      v.select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum(col("cnt")).over(Window.partitionBy("source")))
        .withColumn(s"rn$sfx", row_number().over(
          Window.partitionBy("source").orderBy(col("cnt").desc, col("term"))))
        .select(col("source"), col("term"),
          expr("cnt * 1000000 DIV tot").as(s"p$sfx"), col(s"rn$sfx"))
    freqs(v1, "1").join(freqs(v2, "2"), Seq("source", "term"), "full_outer")
      .filter(col("rn1") <= topK || col("rn2") <= topK)
      .select(col("source"), col("term"),
        coalesce(col("p1"), lit(0L)).as("p1"),
        coalesce(col("p2"), lit(0L)).as("p2"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_support_terms"),
        sum(abs(col("p2") - col("p1"))).as("tvm"),
        min(struct((-abs(col("p2") - col("p1"))).as("neg"),
          col("term").as("term"),
          (col("p2") - col("p1")).as("delta"))).as("top"))
      .select(col("source"), col("n_support_terms"),
        (col("tvm").cast("double") / lit(2000000.0)).as("total_variation"),
        col("top.term").as("top_drift_term"),
        (col("top.delta").cast("double") / lit(1000000.0)).as("top_drift_delta"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dataset_card" -> { (spark, dir) =>
      datasetCard(Tables.documents(spark, dir)).orderBy("source")
    },

    // Term-distribution drift between the same two synthetic snapshots
    // q_corpus_diff compares — the alerting number beside the counts.
    "q_corpus_drift" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val v1 = docs.filter(col("doc_id") % 17 =!= 3)
      val v2 = docs.withColumn("text",
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
      corpusDrift(v1, v2, 100).orderBy("source")
    },

    // Snapshot diff: v1 = yesterday's crawl (every 17th doc missing),
    // v2 = today's (every 13th doc re-crawled with edits) — the
    // deterministic splits other incremental queries use.
    "q_corpus_diff" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val v1 = docs.filter(col("doc_id") % 17 =!= 3)
      val v2 = docs.withColumn("text",
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
      corpusDiff(v1, v2).orderBy("source")
    },

    "q_pipeline_e2e" -> { (spark, dir) =>
      curatedTrainingSet(Tables.documents(spark, dir)).orderBy("doc_id")
    },
    "q_split_leakage_safe" -> { (spark, dir) =>
      leakageSafeSplit(Tables.documents(spark, dir)).orderBy("doc_id")
    }
  )

  def oracleSql: Map[String, String] = {
    val (sigColsSql, bandSelects, estExpr) = Dedup.minhashOracleFragments
    val shuffleKey = Shingles.hash32Sql("concat('shuffle:', CAST(doc_id AS VARCHAR))")
    val bucket = TextOps.hashBucketSql("k.doc_id")
    val splitKeyBucket = TextOps.hashBucketSql("coalesce(l.cluster_id, d.doc_id)")
    Map(
      "q_corpus_diff" ->
        s"""WITH v1 AS (
           |  SELECT doc_id, source, md5(text) AS h1
           |  FROM documents WHERE doc_id % 17 <> 3),
           |v2 AS (
           |  SELECT doc_id, source,
           |    md5(CASE WHEN doc_id % 13 = 1 THEN text || ' edited'
           |             ELSE text END) AS h2
           |  FROM documents),
           |st AS (
           |  SELECT coalesce(v2.source, v1.source) AS source,
           |    CASE WHEN v1.h1 IS NULL THEN 'added'
           |         WHEN v2.h2 IS NULL THEN 'removed'
           |         WHEN v1.h1 <> v2.h2 THEN 'changed'
           |         ELSE 'unchanged' END AS status
           |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
           |SELECT source,
           |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           |  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
           |FROM st GROUP BY source ORDER BY source""".stripMargin,
      // same micro-long floor-div quantization as the Spark side; the
      // argmax term re-derived by a rank window (ties term-ascending)
      "q_corpus_drift" ->
        s"""WITH v1 AS (
           |  SELECT source, text FROM documents WHERE doc_id % 17 <> 3),
           |v2 AS (
           |  SELECT source,
           |    CASE WHEN doc_id % 13 = 1 THEN text || ' edited' ELSE text END AS text
           |  FROM documents),
           |t1 AS (
           |  SELECT source, term FROM (
           |    SELECT source, unnest(string_split(text, ' ')) AS term FROM v1)
           |  WHERE term <> ''),
           |t2 AS (
           |  SELECT source, term FROM (
           |    SELECT source, unnest(string_split(text, ' ')) AS term FROM v2)
           |  WHERE term <> ''),
           |f1 AS (SELECT source, term, count(*) AS cnt FROM t1 GROUP BY 1, 2),
           |f2 AS (SELECT source, term, count(*) AS cnt FROM t2 GROUP BY 1, 2),
           |g1 AS (
           |  SELECT source, term,
           |    (cnt * 1000000) // (sum(cnt) OVER (PARTITION BY source)) AS p1,
           |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rn1
           |  FROM f1),
           |g2 AS (
           |  SELECT source, term,
           |    (cnt * 1000000) // (sum(cnt) OVER (PARTITION BY source)) AS p2,
           |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rn2
           |  FROM f2),
           |sup AS (
           |  SELECT coalesce(a.source, b.source) AS source,
           |    coalesce(a.term, b.term) AS term,
           |    coalesce(a.p1, 0) AS p1, coalesce(b.p2, 0) AS p2
           |  FROM g1 a FULL OUTER JOIN g2 b
           |    ON a.source = b.source AND a.term = b.term
           |  WHERE a.rn1 <= 100 OR b.rn2 <= 100),
           |agg AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_support_terms,
           |    sum(abs(p2 - p1)) AS tvm
           |  FROM sup GROUP BY source),
           |ranked AS (
           |  SELECT source, term, p2 - p1 AS delta,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY abs(p2 - p1) DESC, term) AS r
           |  FROM sup)
           |SELECT a.source, a.n_support_terms,
           |  CAST(a.tvm AS DOUBLE) / 2000000.0 AS total_variation,
           |  t.term AS top_drift_term,
           |  CAST(t.delta AS DOUBLE) / 1000000.0 AS top_drift_delta
           |FROM agg a JOIN ranked t ON a.source = t.source AND t.r = 1
           |ORDER BY a.source""".stripMargin,
      "q_dataset_card" ->
        s"""WITH tok AS (
           |  SELECT doc_id, term FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
           |  WHERE term <> ''),
           |tpd AS (SELECT doc_id, count(*) AS n_toks FROM tok GROUP BY doc_id),
           |copies AS (
           |  SELECT md5(text) AS h, count(*) AS n_copies
           |  FROM documents GROUP BY md5(text)),
           |docagg AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(coalesce(t.n_toks, 0)) AS BIGINT) AS n_tokens,
           |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |    CAST(sum(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_dup_docs
           |  FROM documents d
           |  JOIN copies c ON md5(d.text) = c.h
           |  LEFT JOIN tpd t ON d.doc_id = t.doc_id
           |  GROUP BY source),
           |pl AS (SELECT source, lang, count(*) AS nl
           |       FROM documents GROUP BY source, lang),
           |pl2 AS (SELECT source, lang, nl,
           |          sum(nl) OVER (PARTITION BY source) AS tot FROM pl),
           |lmax AS (SELECT source, max(nl) AS mx FROM pl GROUP BY source),
           |ltop AS (
           |  SELECT p.source, min(p.lang) AS top_lang
           |  FROM pl p JOIN lmax m ON p.source = m.source AND p.nl = m.mx
           |  GROUP BY p.source),
           |hent AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
           |    CAST(CAST(sum(CAST(
           |      -((CAST(nl AS DOUBLE) / CAST(tot AS DOUBLE))
           |        * ln(CAST(nl AS DOUBLE) / CAST(tot AS DOUBLE)))
           |      AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS lang_entropy
           |  FROM pl2 GROUP BY source)
           |SELECT a.source, a.n_docs, a.n_tokens, a.total_chars, a.n_dup_docs,
           |  h.n_langs, t.top_lang, h.lang_entropy
           |FROM docagg a
           |JOIN hent h ON a.source = h.source
           |JOIN ltop t ON a.source = t.source
           |ORDER BY a.source""".stripMargin,
      "q_split_leakage_safe" ->
        s"""WITH RECURSIVE
           |sh0 AS (${Shingles.shinglesSql(3)}),
           |hashes AS (
           |  SELECT DISTINCT doc_id, ${Shingles.hash32Sql("shingle")} AS h FROM sh0),
           |sigs AS MATERIALIZED (
           |  SELECT doc_id,
           |    $sigColsSql
           |  FROM hashes GROUP BY doc_id),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
           |edges0 AS (
           |  SELECT d1, d2 FROM (
           |    SELECT c.d1, c.d2, CAST($estExpr AS DOUBLE) / 8.0 AS ej
           |    FROM cand c
           |    JOIN sigs s1 ON c.d1 = s1.doc_id
           |    JOIN sigs s2 ON c.d2 = s2.doc_id) t
           |  WHERE ej >= 0.5),
           |edges AS (
           |  SELECT d1 AS src, d2 AS dst FROM edges0
           |  UNION ALL SELECT d2, d1 FROM edges0),
           |reach AS (
           |  SELECT src AS node, src AS lab FROM edges
           |  UNION
           |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.node = e.src),
           |labels AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
           |SELECT d.doc_id,
           |  coalesce(l.cluster_id, d.doc_id) AS split_key,
           |  CASE WHEN $splitKeyBucket < 80 THEN 'train'
           |       WHEN $splitKeyBucket < 90 THEN 'valid'
           |       ELSE 'test' END AS split
           |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
           |ORDER BY d.doc_id""".stripMargin,
      "q_pipeline_e2e" ->
        s"""WITH RECURSIVE
           |tok AS (
           |  SELECT doc_id, term FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) z
           |  WHERE term <> ''),
           |stop AS (
           |  SELECT term AS stop_term FROM (
           |    SELECT term, count(*) AS n FROM tok GROUP BY term
           |    ORDER BY n DESC, term LIMIT 10)),
           |stats AS (
           |  SELECT t.doc_id, count(*) AS n_tokens, count(DISTINCT t.term) AS n_types,
           |    sum(CASE WHEN s.stop_term IS NOT NULL THEN 1 ELSE 0 END) AS n_stop
           |  FROM tok t LEFT JOIN stop s ON t.term = s.stop_term
           |  GROUP BY t.doc_id),
           |qual AS MATERIALIZED (
           |  SELECT doc_id,
           |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3
           |      + (CAST(n_types AS DOUBLE) / n_tokens) * 0.3
           |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.4 AS quality
           |  FROM stats),
           |gated AS MATERIALIZED (SELECT doc_id FROM qual WHERE quality >= 0.5),
           |sh0 AS MATERIALIZED (${Shingles.shinglesSql(3)}),
           |probe AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id < 3),
           |hits AS (
           |  SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
           |  FROM sh0 s JOIN probe p ON s.shingle = p.shingle
           |  WHERE s.doc_id >= 3 AND s.doc_id IN (SELECT doc_id FROM gated)
           |  GROUP BY s.doc_id),
           |clean AS MATERIALIZED (
           |  SELECT doc_id FROM gated
           |  WHERE doc_id NOT IN (SELECT doc_id FROM hits WHERE n_hits >= 3)),
           |hashes AS (
           |  SELECT DISTINCT doc_id, ${Shingles.hash32Sql("shingle")} AS h
           |  FROM sh0 WHERE doc_id IN (SELECT doc_id FROM clean)),
           |sigs AS MATERIALIZED (
           |  SELECT doc_id,
           |    $sigColsSql
           |  FROM hashes GROUP BY doc_id),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
           |edges0 AS (
           |  SELECT d1, d2 FROM (
           |    SELECT c.d1, c.d2, CAST($estExpr AS DOUBLE) / 8.0 AS ej
           |    FROM cand c
           |    JOIN sigs s1 ON c.d1 = s1.doc_id
           |    JOIN sigs s2 ON c.d2 = s2.doc_id) t
           |  WHERE ej >= 0.5),
           |edges AS (
           |  SELECT d1 AS src, d2 AS dst FROM edges0
           |  UNION ALL SELECT d2, d1 FROM edges0),
           |reach AS (
           |  SELECT src AS node, src AS lab FROM edges
           |  UNION
           |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.node = e.src),
           |labels AS MATERIALIZED (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
           |ranked AS MATERIALIZED (
           |  SELECT l.cluster_id, l.doc_id,
           |    row_number() OVER (PARTITION BY l.cluster_id
           |                       ORDER BY coalesce(q.quality, -1.0) DESC, l.doc_id) AS rn
           |  FROM labels l LEFT JOIN qual q ON l.doc_id = q.doc_id),
           |kept AS MATERIALIZED (
           |  SELECT doc_id FROM clean
           |  WHERE doc_id NOT IN (
           |    SELECT doc_id FROM labels
           |    WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn = 1))),
           |sr AS (
           |  SELECT doc_id,
           |    row_number() OVER (ORDER BY $shuffleKey, doc_id) AS shuffle_pos
           |  FROM kept),
           |tokp AS MATERIALIZED (
           |  SELECT doc_id, pos, term FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS term,
           |           generate_subscripts(string_split(text, ' '), 1) AS pos
           |    FROM documents) z
           |  WHERE term <> '' AND doc_id IN (SELECT doc_id FROM kept)),
           |vocab AS (
           |  SELECT term, CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS token_id
           |  FROM (SELECT term, count(*) AS n FROM tokp GROUP BY term
           |        ORDER BY n DESC, term LIMIT 20)),
           |enc AS (
           |  SELECT t.doc_id, t.pos, coalesce(v.token_id, 0) AS id
           |  FROM tokp t LEFT JOIN vocab v ON t.term = v.term),
           |encoded AS (
           |  SELECT doc_id, count(*) AS n_tokens,
           |    CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           |    md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
           |  FROM enc GROUP BY doc_id)
           |SELECT k.doc_id,
           |  CASE WHEN $bucket < 80 THEN 'train'
           |       WHEN $bucket < 90 THEN 'valid'
           |       ELSE 'test' END AS split,
           |  sr.shuffle_pos, e.n_tokens, e.n_oov, e.ids_md5
           |FROM kept k
           |JOIN sr ON k.doc_id = sr.doc_id
           |JOIN encoded e ON k.doc_id = e.doc_id
           |ORDER BY k.doc_id""".stripMargin
    )
  }
}
