package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the PERF.md plan audit as assertions,
  * so a future change can't silently lose pushdown, broadcast choice,
  * or top-k planning.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_top_orders plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q_weighted_sample plans as TakeOrderedAndProject riding the scan (no shuffle)") {
    val p = plan("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q_repetition is two hash aggregates on doc_id — no join, no cartesian") {
    val p = plan("q_repetition")
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q_pricing_summary pushes the shipdate filter into the parquet scan") {
    val p = plan("q_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q_pricing_summary prunes columns: unused lineitem fields never reach the scan") {
    val p = plan("q_pricing_summary")
    assert(!p.contains("l_partkey"), p)
    assert(!p.contains("l_suppkey"), p)
    assert(!p.contains("l_tax"), p)
  }

  test("q_region_revenue broadcasts all three dimension tables") {
    val p = plan("q_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_related_terms uses a broadcast join for the query vector, not a closure") {
    val docs = graft.core.Tables.documents(spark, dir)
    val tf = graft.tfidf.TfIdf.tfidf(docs)
    val df = graft.sim.Semantic.relatedTermsFrom(tf, graft.sim.Semantic.queryTermFrom(tf), 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_window_topn gets the WindowGroupLimit pushdown for rn <= 3") {
    val p = plan("q_window_topn")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_source_cap gets the WindowGroupLimit pushdown for its per-source quota") {
    // the claim in the query doc: rank <= 15 under a per-source window
    // plans as a bounded per-group heap, not a full group sort
    val p = plan("q_source_cap")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_soft_dedup gets the WindowGroupLimit pushdown for its 64-row literal cap") {
    // the variable per-cluster quota can't push down, so the operator
    // stacks it above a LITERAL rank <= 64 filter that can — a one-
    // giant-cluster corpus costs a 64-row heap, not a cluster-size sort
    val p = plan("q_soft_dedup")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_interval_join broadcasts the tiny tier table (nested-loop, stream side unshuffled)") {
    val p = plan("q_interval_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_sessionize_salted: the event-sized phase-1 window is keyed " +
      "(user_id, bkt) — the user-alone merge window only ever sees " +
      "session rows (r14 verdict #1)") {
    val p = plan("q_sessionize_salted")
    // the bucketed exchange + window specs exist
    assert("hashpartitioning\\(user_id#\\d+L?, bkt#".r.findAllIn(p).nonEmpty, p)
    val bucketed = "windowspecdefinition\\(user_id#\\d+L?, bkt#".r
      .findAllIn(p).matchData.map(_.start).toSeq
    assert(bucketed.nonEmpty, p)
    // every user-alone window spec sits ABOVE (earlier in the top-down
    // plan string than) every bucketed one: phase 2's merge runs over
    // phase 1's aggregated session rows, never over raw events
    val userAlone = "windowspecdefinition\\(user_id#\\d+L?, _w".r
      .findAllIn(p).matchData.map(_.start).toSeq ++
      "windowspecdefinition\\(user_id#\\d+L?, s_start".r
        .findAllIn(p).matchData.map(_.start).toSeq
    assert(userAlone.nonEmpty, p)
    assert(userAlone.max < bucketed.min,
      s"a user-alone window appears below the bucketed phase:\n$p")
  }

  test("q_exact_rep_map scans the documents parquet ONCE (r15 stretch #7): " +
      "both subtrees read the persisted hash projection") {
    val docs = graft.core.Tables.documents(spark, dir)
    val (lazyOut, hashed) = graft.ops.Dedup.exactDupMappingLazy(
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text")).as("_h")))
    try {
      val p = lazyOut.queryExecution.executedPlan.toString
      // both consumers (probe side + clique aggregate) read the CACHED
      // hash projection; every parquet-scan print sits inside an
      // InMemoryRelation subtree (the cache's stored child plan, shown
      // once per consumer), so the file is physically read once
      assert("InMemoryTableScan".r.findAllIn(p).length === 2, p)
      assert("FileScan parquet".r.findAllIn(p).length
        === "InMemoryRelation".r.findAllIn(p).length,
        s"a parquet scan escaped the cache:\n$p")
    } finally hashed.unpersist(false)
  }

  test("q_salted_agg joins on (key, salt): no plain-key join survives in the plan") {
    val p = plan("q_salted_agg")
    assert(p.contains("__salt"), p)
  }

  test("q_ann_ivf broadcasts the probe's query side (cell key would park on nCentroids partitions)") {
    // assert on the lazy pipeline: the public wrapper localCheckpoints
    // (to drop its persisted working table), which truncates the
    // visible plan to an ExistingRDD scan
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, dir)
    val cent = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").cast("array<double>").as("cid_v"))
    val (result, scored) = graft.ops.VectorOps.ivfSearchLazy(
      emb, col("vid") >= 490, cent, 5, 1)
    val p = result.queryExecution.executedPlan.toString
    scored.unpersist(false)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_lateral_topn decorrelates to a ranked join (no per-row re-execution shapes)") {
    val p = plan("q_lateral_topn")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_cheapest_supplier computes the argmin as an aggregate, not a window") {
    val p = plan("q_cheapest_supplier")
    assert(!p.contains("Window"), p)
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"), p)
  }

  test("q_date_spine gap-fills via broadcast of the bounded daily aggregate") {
    val p = plan("q_date_spine")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_attribution joins on the user-id equi key (time band as filter, no BNLJ)") {
    val p = plan("q_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_frame_sample fans out via Generate on the executors (no extra exchange)") {
    val p = plan("q_frame_sample")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_datetime_fns computes entirely on the scan: no shuffle except the output sort") {
    val p = plan("q_datetime_fns")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_bm25 broadcasts the query-term and df sides") {
    val p = plan("q_bm25")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("q_moving_revenue evaluates the RANGE frame on a single per-key exchange") {
    val p = plan("q_moving_revenue")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("q_contamination broadcasts the probe shingle set") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_pack_sequences: the only single-partition window is the per-bucket frame") {
    val p = plan("q_pack_sequences")
    // the corpus-sized cumsum is partitioned by bucket; only the
    // one-row-per-bucket subtotal frame may collapse to one partition
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1, p)
    assert(p.contains("hashpartitioning(bucket"), p)
    // bucket offsets re-join the corpus via broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_quantized_knn broadcasts the tiny query side and never sort-merges") {
    val p = plan("q_quantized_knn")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_scd2: both windows ride ONE exchange on the entity key") {
    val p = plan("q_scd2")
    // version + valid_to share the (user_id, ts, event_id) window spec,
    // so the dimension build pays exactly one hash exchange; the
    // remaining exchange is the declared output sort
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("shuffleRank: the only single-partition window is the bucket-count frame") {
    val (out, keyed) = graft.ops.TextOps.shuffleRankLazy(
      graft.core.Tables.documents(spark, dir))
    val p = out.queryExecution.executedPlan.toString
    // the corpus-sized rank is partitioned by bkt; only the ≤256-row
    // bucket subtotal frame may collapse to one partition, and the
    // offsets re-join the corpus via broadcast, not a shuffle
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1, p)
    assert(p.contains("hashpartitioning(bkt"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    keyed.unpersist(false)
  }

  test("q_bpe_encode broadcasts the vocab symbol table into the token stream") {
    val p = plan("q_bpe_encode")
    // the corpus side never shuffles for the join — only the per-doc
    // fingerprint aggregate may exchange on doc_id
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dsir weights broadcast the O(B) model table into the doc-bucket stream") {
    // the token pass reduces to (doc, bucket) counts BEFORE any join;
    // the lambda table (<= 256 rows) must ride a broadcast, never a
    // shuffled join against the corpus. Asserted on the lazy pipeline —
    // the declared query localCheckpoints, truncating its shown plan
    // to an ExistingRDD scan (the ivfSearchLazy convention)
    val docs = graft.core.Tables.documents(spark, dir)
    val (_, wLazy, tok) = graft.ops.Classify.dsirWsumLazy(docs)
    val p = wLazy.queryExecution.executedPlan.toString
    tok.unpersist(false)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_nb_classify broadcasts the bucket-class grid and priors; argmax is a hash aggregate") {
    val p = plan("q_nb_classify")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the per-doc argmax is min(struct(...)) — partial+final aggregate,
    // not a per-doc window sort
    assert(!p.contains("WindowGroupLimit"), p)
  }

  test("q_pq_ann: ADC scoring never shuffles — LUT rides a broadcast, top-k is WindowGroupLimit") {
    val p = plan("q_pq_ann")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_ivfpq: cell-restricted ADC joins broadcast, top-k is WindowGroupLimit") {
    val (lazyPlan, assigned) = graft.ops.VectorOps.ivfPqSearchLazy(
      graft.core.Tables.embeddings(spark, dir),
      org.apache.spark.sql.functions.col("vid") < 5, 8, 8, 16, 10, 64)
    val p = lazyPlan.queryExecution.executedPlan.toString
    assigned.unpersist(false)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_pq_rerank: shortlist and queries ride broadcasts back onto the corpus scan") {
    val p = plan("q_pq_rerank")
    // candidate fetch + query fetch are both broadcast equi-joins; the
    // exact pass must never sort-merge the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_dsir_resample selects via TakeOrderedAndProject — no global sort or window") {
    val p = plan("q_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q_bigram_nll and q_intradoc_dedup never go cartesian") {
    for (q <- Seq("q_bigram_nll", "q_intradoc_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("fuzzy decontamination: the probe side rides broadcasts, never a corpus self-join") {
    val docs = graft.core.Tables.documents(spark, dir)
    val (lazyOut, sigs) = graft.ops.Dedup.fuzzyDecontaminationLazy(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 50),
      graft.ops.Dedup.minhashSignatures(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") < 50))
        .localCheckpoint(true), 4)
    val p = lazyOut.queryExecution.executedPlan.toString
    sigs.unpersist(false)
    // ONE fused broadcast band join carries both candidates and the
    // agreement scoring (r15: the probe's band AND signature columns
    // ride the same broadcast; the old corpus-sized scoring join and
    // the second probe broadcast are gone)
    assert("BroadcastHashJoin".r.findAllIn(p).length === 1, p)
    // the corpus side never shuffles for a join: every exchange left
    // in the plan is the final aggregation's, not a join input's
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("phash pairs: banded candidates join on byte buckets — never cartesian") {
    val media = graft.multimodal.Multimodal.mediaTable(spark, dir)
    val (lazyOut, h) = graft.multimodal.Multimodal.phashPairsLazy(media, 7)
    val p = lazyOut.queryExecution.executedPlan.toString
    h.unpersist(false)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_cluster_purity: centroids broadcast onto the corpus scan, never sort-merged") {
    val p = plan("q_cluster_purity")
    // the corpus×C assignment is a broadcast nested-loop BY DESIGN
    // (C rows against the scan); nothing may sort-merge
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_knn_label_vote: neighbor lists ride broadcasts, the label table never does") {
    val p = plan("q_knn_label_vote")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_hard_negatives: anchors broadcast; top-k is WindowGroupLimit") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // non-equi label filter
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_retrieval_eval: neighbor lists and label counts ride broadcasts") {
    val p = plan("q_retrieval_eval")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_zipf_fit: top-1000 terms via TakeOrderedAndProject, not a global sort") {
    val p = plan("q_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q_linear_quality scoring: weight table broadcast, no sort-merge join") {
    val p = plan("q_linear_quality")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_triplets: one scored scan, WindowGroupLimit per (anchor, side)") {
    val p = plan("q_triplets")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_gate_report: weight table broadcast, no sort-merge join") {
    val p = plan("q_gate_report")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_length_quantiles: the data-sized rank window is band-partitioned") {
    val p = plan("q_length_quantiles")
    // two bounded single-partition collapses are allowed: the
    // one-row-per-band offset frame and the one-row global count;
    // the corpus-sized row_number window must partition by band
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 2, p)
    assert(p.contains("hashpartitioning(band"), p)
    assert("windowspecdefinition\\(band".r.findAllIn(p).nonEmpty, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_phrase_search: phrase probe broadcasts, top-k is TakeOrderedAndProject") {
    val p = plan("q_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_skew_report: top-k via TakeOrderedAndProject, totals broadcast back") {
    val p = plan("q_skew_report")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("diagnostics/layout queries never go cartesian or sort-merge") {
    for (q <- Seq("q_selfjoin_cost", "q_zorder_zonemap", "q_char_entropy",
        "q_lang_confidence", "q_pack_bins", "q_hll_merge")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
    }
  }

  test("q_source_quantiles: every data window partitions by (source[, band])") {
    val p = plan("q_source_quantiles")
    // the per-source prefix frame partitions by source — nothing
    // corpus-sized may collapse to one partition (the one-row global
    // count of the unstratified form doesn't exist here)
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1, p)
    assert(p.contains("hashpartitioning(source"), p)
  }

  test("q_curriculum: the rank window is band-partitioned — no single-partition exchange") {
    val p = plan("q_curriculum")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"), p) // the unigram model join
  }

  test("q_label_prop: the final stitch is a plain equi-join, never cartesian") {
    val p = plan("q_label_prop")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_token_budget_sample and q_corpus_diff never go cartesian") {
    for (q <- Seq("q_token_budget_sample", "q_corpus_diff")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("q_dataset_card: stream-keyed equi-joins only, no cartesian") {
    // (q_kn_bigram_nll checkpoints eagerly — its joins are the same
    // (prev,term)-keyed shapes as q_bigram_nll, pinned above)
    val p = plan("q_dataset_card")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bigram stream: native token_pairs kernel, no join, no window (r8 #4 → r17)") {
    // the novelty/phrase bigram source: positional self-join (r8) →
    // lead window (one corpus-wide exchange+sort) → per-doc kernel
    val docs = graft.core.Tables.documents(spark, dir)
    val p = graft.ops.TextOps.bigramStream(docs, Seq("source"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("token_pairs"), p)
    // at most the scale-adaptive small-scan spread; never the window's
    // mandatory corpus-wide exchange+sort
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("q_lsh_occupancy prices every setting with zero joins past the sign-word pass") {
    val p = plan("q_lsh_occupancy")
    assert(!p.contains("Join"), p)
    // the sign-word pass is checkpointed; the settings fan out as
    // shift-and-mask projections of it, never re-scanning the vectors
    assert(!p.contains("FileScan parquet"), p)
  }

  test("q_gate_sweep re-thresholds ONE checkpointed scored pass (broadcast 4-row join)") {
    val p = plan("q_gate_sweep")
    // no parquet rescan: training + scoring happened before the
    // checkpoint; the sweep is the broadcast threshold fanout only
    assert(!p.contains("FileScan parquet"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("broadcastQuery=false fallback: equal output via a shuffled join, never a broadcast (r9 #9)") {
    // the documented stop-word escape hatch (Semantic.scala): a query
    // term whose doc vector outgrows the broadcast budget joins
    // shuffled instead. Pin (a) output equality to the broadcast path
    // and (b) the plan actually shuffles — with auto-broadcast
    // disabled so tiny-testdata size estimates can't silently promote
    // the hint-less join back to a broadcast.
    val docs = graft.core.Tables.documents(spark, dir)
    val tf = graft.tfidf.TfIdf.tfidf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = graft.sim.Semantic.queryTermFrom(tf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bcast = graft.sim.Semantic
        .relatedTermsFrom(tf, q, 5, None, broadcastQuery = true)
      val shuffled = graft.sim.Semantic
        .relatedTermsFrom(tf, q, 5, None, broadcastQuery = false)
      assert(shuffled.collect().map(_.toString).toSeq
        === bcast.collect().map(_.toString).toSeq,
        "shuffled fallback must return the broadcast path's answer")
      val p = shuffled.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
      val pb = bcast.queryExecution.executedPlan.toString
      assert(pb.contains("BroadcastHashJoin"), pb) // the hint still wins
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      tf.unpersist(false)
    }
  }

  test("q_phrase_search3 probe: anchor + positional intersections all broadcast, no cartesian") {
    val p = plan("q_phrase_search3")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("deleted-doc suppression rides a BROADCAST anti-join: the takedown " +
      "set must never force a corpus-sized shuffle of the signature store") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, dir)
    val state = java.nio.file.Files
      .createTempDirectory("plan-dedup-del").toString
    graft.ops.Dedup.clustersIngestBatch(docs.filter(col("doc_id") < 400), 0, state)
    graft.ops.Dedup.deleteFromDedupState(spark, state,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val p = graft.ops.Dedup.readSignatureStoreState(spark, state)
      .queryExecution.executedPlan.toString
    // anti-join present, broadcast-shaped, no shuffle of the store side
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedupedCorpus drop-set emission: broadcast anti-join by default, " +
      "forced shuffled (merge) under broadcastDrop=false — same rows either way") {
    val docs = graft.core.Tables.documents(spark, dir)
    val clusters = graft.ops.Dedup.dupClusters(docs, 0.5)
      .localCheckpoint(true)
    val bc = graft.ops.Dedup.dedupedCorpus(docs, clusters, broadcastDrop = true)
    val sh = graft.ops.Dedup.dedupedCorpus(docs, clusters, broadcastDrop = false)
    val pBc = bc.queryExecution.executedPlan.toString
    val pSh = sh.queryExecution.executedPlan.toString
    // default: the drop set rides a broadcast; the corpus never shuffles
    assert(pBc.contains("BroadcastHashJoin") && pBc.contains("LeftAnti"), pBc)
    assert(!pBc.contains("SortMergeJoin"), pBc)
    // crawl-dup-rate shape: the SAME anti-join, shuffled — no broadcast
    // of a potentially corpus-order drop set anywhere in the plan
    assert(pSh.contains("SortMergeJoin") && pSh.contains("LeftAnti"), pSh)
    assert(!pSh.contains("BroadcastHashJoin"), pSh)
    // output identity: strategy is invisible in the rows
    val a = bc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = sh.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("keepBestCorpus / softDedupCorpus honor the same broadcastDrop dial") {
    val docs = graft.core.Tables.documents(spark, dir)
    val clusters = graft.ops.Dedup.dupClusters(docs, 0.5)
      .localCheckpoint(true)
    val q = graft.ops.TextOps.qualityScores(docs).localCheckpoint(true)
    val kbSh = graft.ops.Dedup
      .keepBestCorpus(docs, clusters, q, broadcastDrop = false)
    val sdSh = graft.ops.Dedup
      .softDedupCorpus(docs, clusters, q, 64, broadcastDrop = false)
    for (df <- Seq(kbSh, sdSh)) {
      val p = df.queryExecution.executedPlan.toString
      // the final drop-set anti-join is shuffled; smaller interior
      // joins (keep table, quota window input) may still broadcast
      assert(p.contains("SortMergeJoin") && p.contains("LeftAnti"), p)
    }
    // identity vs the broadcast default
    val kbBc = graft.ops.Dedup.keepBestCorpus(docs, clusters, q)
    assert(kbSh.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      kbBc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
