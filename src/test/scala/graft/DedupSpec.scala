package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Unit tests for dedup knobs not covered by the declared queries. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("jaccardPairs dfCeiling: capped posting lists keep near-dup recall") {
    def pairSet(ceiling: Int) =
      Dedup.jaccardPairs(docs, 3, 0.6, ceiling)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Int.MaxValue)
    val capped = pairSet(4)
    assert(exact.nonEmpty)
    // real near-dups overlap on their rare shingles, so dropping the
    // high-df head must retain (almost) all of them
    val recall = (exact intersect capped).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall: exact=${exact.size} capped=${capped.size}")
  }

  test("maxOccupancy (r13 verdict #1): recall is untouched while no bucket " +
      "exceeds the cap; a planted mega-bucket drops exactly its own pairs, " +
      "and the cap report prices the dropped mass") {
    import org.apache.spark.sql.functions._
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1. generous cap == uncapped, bit-for-bit, on all three banded
    //    joins (no organic bucket at sf0.001 comes near 1000)
    assert(pairSet(Dedup.minhashCandidates(docs, 0.5, maxOccupancy = 1000L))
      === pairSet(Dedup.minhashCandidates(docs, 0.5)),
      "minhash: generous cap changed the candidate set")
    assert(pairSet(Dedup.simhashPairs(docs, 8, maxOccupancy = 1000L))
      === pairSet(Dedup.simhashPairs(docs, 8)),
      "simhash: generous cap changed the pair set")
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(
      Dedup.embeddingNearDupLsh(emb, 4, 4, 64, 20, maxOccupancy = 100000L)
        .collect().map(_.toSeq).toSet
      === Dedup.embeddingNearDupLsh(emb, 4, 4, 64, 20)
        .collect().map(_.toSeq).toSet,
      "embedding LSH: generous cap changed the top-k")
    // 2. planted boilerplate: 12 identical docs are ONE bucket of
    //    occupancy 12 in EVERY band — over a cap of 8, so all 66 of
    //    their pairs drop, while every organic pair survives verbatim
    val planted = docs.select("doc_id", "text").unionByName(
      spark.range(12).select(
        (col("id") + 1000000L).as("doc_id"),
        lit("shared boilerplate template repeated navigation footer body")
          .as("text")))
    val uncapped = pairSet(Dedup.minhashCandidates(planted, 0.5))
    val capped = pairSet(Dedup.minhashCandidates(planted, 0.5,
      maxOccupancy = 8L))
    assert(uncapped.count { case (a, b) => a >= 1000000L && b >= 1000000L }
      === 66, "fixture: the planted clique should emit C(12,2) pairs uncapped")
    assert(capped.forall { case (a, b) => a < 1000000L || b < 1000000L },
      "capped join still emitted mega-bucket pairs")
    assert(capped === uncapped.filter { case (a, b) =>
        a < 1000000L || b < 1000000L },
      "cap dropped (or added) pairs outside the over-cap bucket")
    // 2b. the incremental (daily-ingest) path honors the same ceiling,
    //     measured over the COMBINED history ∪ batch projection: a new
    //     clone of the planted clique pairs with all 12 uncapped and
    //     with none capped, while generous-cap equals uncapped exactly
    val newClone = spark.range(1).select(
      lit(2000000L).as("doc_id"),
      lit("shared boilerplate template repeated navigation footer body")
        .as("text"))
    val histSigs = Dedup.minhashSignatures(planted)
    val incUncapped = pairSet(Dedup.incrementalCandidates(newClone, histSigs, 0.5))
    val incCapped = pairSet(Dedup.incrementalCandidates(newClone, histSigs, 0.5,
      maxOccupancy = 8L))
    assert(incUncapped.count(_._2 == 2000000L) === 12)
    assert(incCapped.isEmpty,
      s"capped incremental still paired against the mega-bucket: $incCapped")
    assert(pairSet(Dedup.incrementalCandidates(
        docs.filter(col("doc_id") >= 400), Dedup.minhashSignatures(
          docs.filter(col("doc_id") < 400)), 0.5, maxOccupancy = 1000L))
      === pairSet(Dedup.incrementalCandidates(
        docs.filter(col("doc_id") >= 400), Dedup.minhashSignatures(
          docs.filter(col("doc_id") < 400)), 0.5)),
      "incremental: generous cap changed the candidate set")
    // 3. the loud report prices exactly that: per band, 1 bucket over,
    //    12 docs parked, 66 pairs avoided
    val rep = Dedup.minhashCapReport(planted, 8L).collect()
    assert(rep.length === 4)
    rep.foreach { r =>
      assert(r.getLong(1) === 1L, s"band ${r.getInt(0)}: buckets_over")
      assert(r.getLong(2) === 12L, s"band ${r.getInt(0)}: docs_in_over")
      assert(r.getLong(3) === 66L, s"band ${r.getInt(0)}: pairs_dropped")
    }
    // ...and reports all-zeros (stable 4-row shape) when nothing drops
    assert(Dedup.minhashCapReport(docs, 1000L).collect()
      .forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(3) == 0L))
  }

  test("maxOccupancy threads through the stateless composing entry points " +
      "(dupClusters / semanticDedup / crossModalDupCandidates): generous " +
      "cap == uncapped, tiny cap collapses a planted clique") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Dedup.dupClusters(docs, 0.5, maxOccupancy = 1000L))
      === rows(Dedup.dupClusters(docs, 0.5)),
      "dupClusters: generous cap changed the clustering")
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(rows(Dedup.semanticDedup(docs, emb, 0.5, 0.9,
        maxOccupancy = 1000L))
      === rows(Dedup.semanticDedup(docs, emb, 0.5, 0.9)),
      "semanticDedup: generous cap changed the confirmed set")
    // planted clique: 12 text-identical docs with no media rows — the
    // capped cross-modal run must drop exactly their text pairs
    val planted = docs.select("doc_id", "text").unionByName(
      spark.range(12).select(
        (col("id") + 1000000L).as("doc_id"),
        lit("shared boilerplate template repeated navigation footer body")
          .as("text")))
    val media = Seq((1L, "image", "payload-bytes"))
      .toDF("media_id", "kind", "payload_s")
      .select(col("media_id"), col("kind"),
        encode(col("payload_s"), "UTF-8").as("payload"))
    val assoc = media.select(col("media_id"), col("media_id").as("doc_id"))
    def xmPairs(cap: Long) =
      Dedup.crossModalDupCandidates(planted, media, assoc, 0.5, 7,
          maxOccupancy = cap)
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xmUncapped = xmPairs(Long.MaxValue)
    val xmCapped = xmPairs(8L)
    assert(xmUncapped.count { case (a, b) =>
      a >= 1000000L && b >= 1000000L } === 66)
    assert(xmCapped === xmUncapped.filter { case (a, b) =>
        a < 1000000L || b < 1000000L },
      "crossModal cap dropped (or added) pairs outside the clique")
  }

  test("upstream exact-collapse recipe, stateful: ingesting one rep per " +
      "exact clique and expanding through exactDupMapping equals the " +
      "direct clustersIngestBatch ingest bit-for-bit") {
    import org.apache.spark.sql.functions._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def assignSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "cluster_size").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // planted boilerplate clique split ACROSS the two batches (each
    // batch collapses independently, so the cross-batch copies ride
    // the near-dup edge between the two reps)
    val clique = spark.range(12).select(
      (col("id") + 1000000L).as("doc_id"),
      lit("shared boilerplate template repeated navigation footer body")
        .as("text"))
    val all = docs.select("doc_id", "text").unionByName(clique)
    val b0 = all.filter(col("doc_id") < 400 ||
      (col("doc_id") >= 1000000L && col("doc_id") < 1000006L))
    val b1 = all.filter((col("doc_id") >= 400 && col("doc_id") < 1000000L) ||
      col("doc_id") >= 1000006L)
    val direct = tmp("collapse-direct")
    Dedup.clustersIngestBatch(b0, 0, direct)
    Dedup.clustersIngestBatch(b1, 1, direct)
    // collapsed path: per-batch rep map, reps-only ingest
    val m0 = Dedup.exactDupMapping(b0).localCheckpoint(true)
    val m1 = Dedup.exactDupMapping(b1).localCheckpoint(true)
    val collapsed = tmp("collapse-reps")
    Dedup.clustersIngestBatch(
      b0.join(m0.filter(col("doc_id") === col("rep_id")).select("doc_id"),
        Seq("doc_id")), 0, collapsed)
    Dedup.clustersIngestBatch(
      b1.join(m1.filter(col("doc_id") === col("rep_id")).select("doc_id"),
        Seq("doc_id")), 1, collapsed)
    val repAssign = Dedup.readClusterAssignment(spark, collapsed)
    // the collapsed store held 2 reps where the corpus held 12 docs
    assert(repAssign.filter(col("doc_id") >= 1000000L).count() <= 2,
      "collapse leaked clique members into the rep state")
    val expanded = Dedup.expandCollapsedAssignment(
      m0.unionByName(m1), repAssign)
    assert(assignSet(expanded)
      === assignSet(Dedup.readClusterAssignment(spark, direct)),
      "expanded collapsed assignment != direct ingest")
  }

  test("single-scan exactDupMapping (r15 stretch #7): the persisted-hash " +
      "shape is bit-equal to the naive two-subtree groupBy+join recompute") {
    import org.apache.spark.sql.functions._
    val clique = spark.range(9).select(
      (col("id") + 2000000L).as("doc_id"),
      lit("identical mega clique body text").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(clique)
    val naive = corpus.select(col("doc_id"), md5(col("text")).as("_h"))
      .join(corpus.groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("rep_id")), Seq("_h"))
      .select(col("doc_id"), col("rep_id"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.exactDupMapping(corpus)) === pairs(naive),
      "single-scan mapping diverged from the naive recompute")
  }

  test("prefix filtering is lossless: equals the all-postings join at every threshold") {
    // the entire point of q_jaccard_prefix: only each doc's rarest
    // (1−τ) shingles enter the index, yet the result is IDENTICAL to
    // the full inverted-index join — including τ=0.5 where the ceil()
    // boundary lands exactly on integers (the float-nudge edge case)
    for (t <- Seq(0.5, 0.6, 0.8)) {
      val full = Dedup.jaccardPairs(docs, 3, t)
        .collect().map(_.toSeq).toSet
      val pref = Dedup.jaccardPrefixFilter(docs, 3, t)
        .collect().map(_.toSeq).toSet
      assert(pref === full, s"threshold $t: prefix-filtered != full join")
      assert(full.nonEmpty || t > 0.5, s"threshold $t produced no pairs to compare")
    }
  }

  test("signature/cluster reuse entry points equal the one-shot chain") {
    import org.apache.spark.sql.functions._
    // a pipeline materializes the signature table once and feeds every
    // downstream step — results must equal the per-step one-shot API
    val sigs = Dedup.minhashSignatures(docs)
    val candReuse = Dedup.candidatesFromSignatures(sigs, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candOneShot = Dedup.minhashCandidates(docs, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candReuse === candOneShot && candReuse.nonEmpty)
    val clusters = Dedup.clustersFromCandidates(Dedup.minhashCandidates(docs, 0.5))
    val keepReuse = Dedup.dedupedCorpus(docs, clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepOneShot = Dedup.dedupedCorpus(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepReuse === keepOneShot && keepReuse.nonEmpty)
    // the decision table drops exactly the non-canonical cluster members
    val dropped = clusters.filter(col("doc_id") =!= col("cluster_id")).count()
    assert(keepReuse.size.toLong === docs.count() - dropped)
  }

  test("shared-shingle entry points equal their doc-level originals") {
    import org.apache.spark.sql.functions._
    // a curation run materializes ONE shingle pass and feeds both the
    // minhash sketch and decontamination from it — both must equal the
    // per-stage APIs that shingle the docs themselves
    val sh = graft.text.Shingles.shingles(docs, 3)
    val fromSh = Dedup.minhashSignaturesFromShingles(sh)
      .collect().map(_.toSeq).toSet
    val fromDocs = Dedup.minhashSignatures(docs)
      .collect().map(_.toSeq).toSet
    assert(fromSh === fromDocs && fromSh.nonEmpty)
    val probe = docs.filter(col("doc_id") < 3)
    val contSh = graft.ops.TextOps
      .contaminationFromShingles(sh.filter(col("doc_id") >= 3), probe, 3)
      .collect().map(_.toSeq).toSet
    val contDocs = graft.ops.TextOps
      .contamination(docs.filter(col("doc_id") >= 3), probe, 3)
      .collect().map(_.toSeq).toSet
    assert(contSh === contDocs && contSh.nonEmpty)
  }

  test("incrementalCandidates == full candidates restricted to the new batch") {
    import org.apache.spark.sql.functions._
    // signatures are per-document, so deduping the increment against
    // the history index must find exactly the full pass's pairs that
    // touch the increment — and never pair the history with itself
    val inc = Dedup.incrementalCandidates(
        docs.filter(col("doc_id") >= 400),
        Dedup.minhashSignatures(docs.filter(col("doc_id") < 400)), 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashCandidates(docs, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a >= 400 || b >= 400 }
    assert(inc === expected && inc.nonEmpty)
    assert(inc.forall { case (a, b) => a >= 400 || b >= 400 })
  }

  test("incrementalClusters == full re-cluster on the real corpus split") {
    import org.apache.spark.sql.functions._
    // the declared contract: folding the batch's edges into the
    // history assignment through root compression must reproduce the
    // from-scratch clustering bit-for-bit (labels AND sizes)
    val hist = docs.filter(col("doc_id") < 400)
    val sigs = Dedup.minhashSignatures(hist)
    val inc = Dedup.incrementalClusters(
        Dedup.clustersFromCandidates(Dedup.candidatesFromSignatures(sigs, 0.5)),
        sigs, docs.filter(col("doc_id") >= 400), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.dupClusters(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full && inc.nonEmpty)
  }

  test("incrementalClusters: a bridging batch merges two old clusters; " +
      "an edge-free history doc can join late") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // history: cluster A = {1, 2} (identical text), cluster B = {5, 6}
    // (identical text), doc 8 edge-free. Batch: doc 100 straddles A's
    // and B's vocabulary (the bridge), doc 102 is a copy of doc 8.
    // vocab split chosen (offline, same md5 + affine perms) so the
    // bridge doc band-collides with BOTH halves while A-B, C-anything
    // stay collision-free — MinHash here is deterministic, so this
    // holds on every run
    val ta = (1 to 36).map(i => s"apple$i").mkString(" ")
    val tb = (1 to 36).map(i => s"mango$i").mkString(" ")
    val tm = ((1 to 20).map(i => s"apple$i") ++ (1 to 16).map(i => s"mango$i")).mkString(" ")
    val tc = (1 to 36).map(i => s"violet$i").mkString(" ")
    val all = Seq(
      (1L, ta), (2L, ta), (5L, tb), (6L, tb), (8L, tc),
      (100L, tm), (102L, tc)).toDF("doc_id", "text")
    val hist = all.filter(col("doc_id") < 100)
    val batch = all.filter(col("doc_id") >= 100)
    // τ = 0.25 so the half-overlap bridge edges fire (MinHash est is
    // deterministic — same hash functions every run)
    val tau = 0.25
    val sigs = Dedup.minhashSignatures(hist)
    val oldAssign = Dedup.clustersFromCandidates(
      Dedup.candidatesFromSignatures(sigs, tau))
    // precondition: A and B are SEPARATE clusters in the history
    val oldMap = oldAssign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oldMap(1L) === 1L && oldMap(2L) === 1L)
    assert(oldMap(5L) === 5L && oldMap(6L) === 5L)
    assert(!oldMap.contains(8L), "doc 8 must start edge-free")
    val inc = Dedup.incrementalClusters(oldAssign, sigs, batch, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.dupClusters(all, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full && inc.nonEmpty)
    val incMap = inc.map { case (d, c, _) => d -> c }.toMap
    // the bridge merged A and B (global min label = 1) ...
    assert(incMap(100L) === 1L, s"bridge edge did not fire: $incMap")
    assert(incMap(1L) === 1L && incMap(5L) === 1L && incMap(6L) === 1L,
      s"old cluster B was not relabeled through the merge: $incMap")
    // ... and the merged cluster's size covers all five members
    assert(inc.contains((5L, 1L, 5L)), s"merged size wrong: $inc")
    // the previously edge-free history doc joins its late twin
    assert(incMap(8L) === 8L && incMap(102L) === 8L,
      s"edge-free history doc did not join: $incMap")
  }

  test("spanDupStats: coverage is bounded and planted whole-doc dups are near-fully covered") {
    val stats = Dedup.spanDupStats(docs, 8).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val n = r.getLong(1); val d = r.getLong(2)
      assert(d >= 1 && d <= n, s"doc ${r.getLong(0)}: dup_tokens $d vs n_tokens $n")
    }
    // planted pairs are whole-document near-dups, so at least one doc
    // must be almost entirely inside shared spans
    assert(stats.exists(r => r.getLong(2).toDouble / r.getLong(1) >= 0.9))
  }

  test("jaccardPairs dfCeiling actually bounds the join input") {
    import org.apache.spark.sql.functions._
    val sh = graft.text.Shingles.shingles(docs, 3).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    val total = sh.count()
    val kept = sh.withColumn("_df", count(lit(1)).over(w))
      .filter(col("_df") <= 4).count()
    assert(kept < total, s"ceiling removed nothing ($kept of $total)")
  }

  test("containmentPairs: subset docs score 1.0 where Jaccard stays low") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a short doc quoted verbatim inside a much longer one: Jaccard is
    // small (union is the long doc) but containment is exactly 1
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = short + " " + (1 to 80).map(i => s"w$i").mkString(" ")
    val two = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(two, 3, 0.8).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert(r.getAs[Double]("containment") === 1.0)
    assert(Dedup.jaccardPairs(two, 3, 0.6).count() === 0,
      "Jaccard must miss the doc-inside-doc pair containment catches")
  }

  test("keepBestPerCluster: picks max quality, min doc_id on ties") {
    import spark.implicits._
    val clusters = Seq(
      (10L, 1L, 3L), (11L, 1L, 3L), (12L, 1L, 3L),
      (20L, 2L, 2L), (21L, 2L, 2L)).toDF("doc_id", "cluster_id", "cluster_size")
    val quality = Seq(
      (10L, 0.5), (11L, 0.9), (12L, 0.9),
      (20L, 0.7), (21L, 0.7)).toDF("doc_id", "quality")
    val out = Dedup.keepBestPerCluster(clusters, quality)
      .orderBy("cluster_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      === Seq((1L, 3L, 11L, 0.9), (2L, 2L, 20L, 0.7)))
  }

  test("cdc chunking is shift-resistant: one inserted token preserves most shared " +
      "chunks where aligned chunking loses everything downstream of the edit") {
    import spark.implicits._
    // 200 distinct tokens; doc 2 = the same text with ONE token inserted
    // near the front, shifting every later position by one
    val toks = (1 to 200).map(i => s"w${i % 50}x$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),
      (2L, (toks.take(5) ++ Seq("zzz") ++ toks.drop(5)).mkString(" "))
    ).toDF("doc_id", "text")

    def dupFrac(df: org.apache.spark.sql.DataFrame): Double =
      df.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
        .head.getAs[Double]("dup_frac")

    val cdcFrac = dupFrac(Dedup.cdcChunkStats(docs, 16))
    val alignedFrac = dupFrac(Dedup.chunkDupStats(docs, 16))
    // content-defined boundaries only change around the edit, so the
    // original doc keeps most of its chunks shared with the edited copy;
    // the aligned grid loses every chunk downstream of the insertion
    assert(cdcFrac > 0.6, s"cdc dup_frac $cdcFrac should survive a 1-token insert")
    assert(alignedFrac < cdcFrac,
      s"aligned $alignedFrac must lose to content-defined $cdcFrac under a shift")
    assert(alignedFrac < 0.35,
      s"aligned chunking kept $alignedFrac after a front-of-doc insert — grid not aligned?")
  }

  test("cdc chunking caps chunk length on degenerate content: a doc repeating one " +
      "boundary-missing token never materializes its whole token list in one group") {
    import spark.implicits._
    // Find a token whose salted hash misses the mod-16 boundary residue,
    // then repeat it: with no content boundaries, only the forced
    // every-kmax boundary bounds the chunk — without the cap this doc
    // is ONE collect_list group of 4000 tokens.
    val probe = (1 to 64).map(i => s"t$i").toDF("term")
      .withColumn("h", graft.text.Shingles.hash32(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("cdc:"),
          org.apache.spark.sql.functions.col("term"))))
      .filter(org.apache.spark.sql.functions.col("h") % 16 =!= 0)
      .head.getString(0)
    val docs = Seq((1L, Seq.fill(4000)(probe).mkString(" "))).toDF("doc_id", "text")

    val kmax = 128
    val stats = Dedup.cdcChunkStats(docs, 16, kmax).head
    assert(stats.getAs[Long]("n_tokens") === 4000L)
    // no content boundary fires, so the chunks are exactly the forced
    // segments: boundaries after pos 128, 256, …, 3968 → 32 chunks of
    // ≤ 128 tokens each (vs ONE 4000-token group without the cap)
    assert(stats.getAs[Long]("n_chunks") === 32L,
      s"expected 32 forced chunks, got ${stats.getAs[Long]("n_chunks")}")
  }

  test("keepBestPerCluster: unscored members stay counted, all-unscored cluster " +
      "falls back to min doc_id with the -1.0 marker (no silent cluster loss)") {
    import spark.implicits._
    val clusters = Seq(
      (10L, 1L, 3L), (11L, 1L, 3L), (12L, 1L, 3L), // 12 has no quality row
      (20L, 2L, 2L), (21L, 2L, 2L) // nobody scored
    ).toDF("doc_id", "cluster_id", "cluster_size")
    val quality = Seq((10L, 0.5), (11L, 0.9)).toDF("doc_id", "quality")
    val out = Dedup.keepBestPerCluster(clusters, quality)
      .orderBy("cluster_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      === Seq((1L, 3L, 11L, 0.9), (2L, 2L, 20L, -1.0)))
  }

  test("keepBestPerCluster: negative qualities are real scores — a scored member " +
      "beats an unscored one even below the old -1.0 sentinel") {
    import spark.implicits._
    val clusters = Seq(
      (10L, 1L, 2L), (11L, 1L, 2L), // 11 unscored, 10 scored at -5.0
      (20L, 2L, 2L), (21L, 2L, 2L)  // both scored, both negative
    ).toDF("doc_id", "cluster_id", "cluster_size")
    val quality = Seq((10L, -5.0), (20L, -2.0), (21L, -0.5)).toDF("doc_id", "quality")
    val out = Dedup.keepBestPerCluster(clusters, quality)
      .orderBy("cluster_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      === Seq((1L, 2L, 10L, -5.0), (2L, 2L, 21L, -0.5)))
  }

  test("intraDocDedup keeps the first span occurrence and drops the repeat") {
    import spark.implicits._
    // "a b c X a b c": the second 'a b c' (positions 5-7) is a repeat
    // of the span first seen at position 1 -> keep-first leaves
    // 'a b c X'; a doc with no repeats survives untouched
    val d = Seq((1L, "a b c X a b c"), (2L, "p q r s")).toDF("doc_id", "text")
    val out = Dedup.intraDocDedup(d, 3).orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 7L && out(0).getLong(2) === 4L)
    val cleanMd5 = Dedup.intraDocDedup(
      Seq((9L, "a b c X")).toDF("doc_id", "text"), 3)
      .select("kept_md5").head.getString(0)
    assert(out(0).getString(4) === cleanMd5,
      "kept fingerprint must equal the fingerprint of the cleaned text")
    assert(out(1).getLong(1) === 4L && out(1).getLong(2) === 4L)
    assert(out(1).getDouble(3) === 1.0)
  }

  test("winnowing honors the paper's density and detection guarantees") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (k, w) = (3, 4)
    // density: consecutive selected positions gap <= w on real docs
    val sel = Dedup.winnowSelections(docs, k, w)
      .select("doc_id", "sel_pos")
      .collect().groupBy(_.getLong(0)).map { case (_, rs) =>
        rs.map(_.getInt(1)).sorted.toSeq
      }
    assert(sel.nonEmpty)
    for (ps <- sel; Seq(a, b) <- ps.sliding(2) if ps.size > 1)
      assert(b - a <= w, s"fingerprint gap ${b - a} > w=$w")
    // detection: a substring of length >= w+k-1 shared between two
    // docs must produce at least one shared fingerprint HASH
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 tokens = w+k-1
    val two = Seq(
      (1L, s"xx yy $shared zz ww qq rr"),
      (2L, s"aa bb cc dd $shared ee ff")).toDF("doc_id", "text")
    val hs = Dedup.winnowSelections(two, k, w)
      .select("doc_id", "sel_h").collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((hs(1L) intersect hs(2L)).nonEmpty,
      "shared >= w+k-1 substring produced no shared fingerprint")
  }

  test("winnowOverlap surfaces a planted shared passage through the detection join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (k, w) = (3, 4)
    // a 12-token shared passage (≥ w+k−1 = 6) between docs 1 and 2,
    // unrelated filler elsewhere — the JOIN path itself must report
    // the pair, not just the fingerprint sets intersect
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven twelve"),
      (3L, "completely unrelated text with nothing in common at all here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlap(corpus, k, w, maxDf = 64, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (d1, d2, n) => d1 == 1L && d2 == 2L && n >= 1 },
      s"planted pair not detected: ${pairs.toSeq}")
    assert(!pairs.exists { case (d1, d2, _) => d2 == 3L || d1 == 3L },
      s"unrelated doc matched: ${pairs.toSeq}")
  }

  test("fuzzyDecontamination flags probe near-copies, never corpus-corpus pairs") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (10L, base + " extra"),          // near-copy of probe 0
      (11L, "totally different text about unrelated things entirely here now"),
      (12L, "totally different text about unrelated things entirely here now")
    ).toDF("doc_id", "text")           // 11/12 are an exact corpus-corpus dup
    val probes = Seq((0L, base), (1L, "another held out benchmark prompt goes here"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyDecontamination(corpus, probes, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet === Set(10L),
      s"only the probe near-copy is contaminated (corpus-corpus dup 11/12 must not appear): ${out.toSeq}")
    val hit = out.head
    assert(hit._2 === 1L && hit._4 === 0L, s"one probe hit, best_probe = 0: $hit")
    assert(hit._3 >= 4L && hit._3 <= 8L)
  }

  test("crossModalDupCandidates: image-dup/text-clean and text-dup/image-clean pairs both arrive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 10/11: identical TEXT, very different image bytes (constant vs
    // alternating → dHash differs in ~half its 64 bits)
    // 20/21: disjoint vocab, IDENTICAL image bytes (hamming 0)
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "one two three four five six seven eight nine ten"),
      (21L, "red blue green yellow purple orange pink white black gray")
    ).toDF("doc_id", "text")
    val media = Seq(
      (10L, "image", "a" * 100),
      (11L, "image", "ab" * 50),
      (20L, "image", "shared-image-payload-bytes-here-0123456789" * 3),
      (21L, "image", "shared-image-payload-bytes-here-0123456789" * 3)
    ).toDF("media_id", "kind", "payload_s")
      .select(col("media_id"), col("kind"),
        encode(col("payload_s"), "UTF-8").as("payload"))
    val assoc = media.select(col("media_id"), col("media_id").as("doc_id"))
    val out = Dedup.crossModalDupCandidates(docs, media, assoc, 0.5, 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Boolean]("text_fired"), r.getAs[Boolean]("image_fired")))
      .toSet
    assert(out.contains((10L, 11L, true, false)),
      s"text-dup/image-clean pair missing or mis-evidenced: $out")
    assert(out.contains((20L, 21L, false, true)),
      s"image-dup/text-clean pair missing or mis-evidenced: $out")
    assert(out.size === 2, s"unexpected extra candidates: $out")
  }

  test("intraDocDedup is non-vacuous on the testdata: some doc loses tokens at k=3") {
    // the declared query runs k=3 BECAUSE the corpus has real 3-token
    // in-doc repeats at every sf (k=8 has none) — guard that stays true
    val out = Dedup.intraDocDedup(docs, 3)
    assert(out.filter(org.apache.spark.sql.functions.col("n_kept") <
      org.apache.spark.sql.functions.col("n_tokens")).count() > 0)
  }
}
