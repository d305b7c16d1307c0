package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, EventOps, Sketches, TextOps}

/** Semantic invariants of the round-5 operators — the properties the
  * DuckDB hash check can't state directly (bounds, containment,
  * equivalence to a reference formulation).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)
  private def tokens = graft.tfidf.TfIdf.tokens(docs).select("term")

  test("count-min estimate never underestimates, and is exact for bucket-collision-free terms") {
    // minFrac = 0 keeps every term, so the bound is checked vocab-wide
    val rows = Sketches.heavyHitters(tokens, 0.0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(1); val exact = r.getLong(2)
      assert(est >= exact, s"term ${r.getString(0)}: est $est < exact $exact")
    }
    // with w=256 buckets and a tiny vocabulary, at least one term should
    // sit alone in its buckets in some row — est == exact there
    assert(rows.exists(r => r.getLong(1) == r.getLong(2)))
  }

  test("heavyHitters reads the corpus once in its final plan: the sketch is a " +
      "collected literal map, not a re-executed corpus aggregate per probe join") {
    // r5 verdict #2: the un-persisted sketch subtree used to re-run the
    // full corpus pass for each of the d probe joins PLUS a separate
    // n_total scan (~6 passes). r16: the ≤ d·w-row sketch is collected
    // (model-sized state, the BPE-merge-table convention) and probed as
    // a literal map, so the returned plan's ONLY corpus read is the
    // candidate exact-count aggregate — no joins, no broadcast builds.
    val hh = Sketches.heavyHitters(tokens, 0.02)
    val plan = hh.queryExecution.executedPlan.toString
    // "Scan parquet" matches both the v1 ("FileScan parquet") and v2
    // ("BatchScan parquet") leaf renderings exactly once each
    val fileScans = "Scan parquet".r.findAllIn(plan).size
    assert(fileScans === 1, s"expected exactly 1 corpus scan, got $fileScans:\n$plan")
    assert(!plan.contains("Join"), s"sketch probes must be literal lookups, not joins:\n$plan")
  }

  test("bloom filter has no false negatives; false positives stay near the designed rate") {
    val keys = graft.core.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val bloom = Sketches.bloomBuild(keys).persist()
    // every build key must pass its own filter
    assert(Sketches.bloomProbe(keys, "o_orderkey", bloom).count() === keys.count())
    // non-member probes: keys far outside the orderkey domain
    val nonMembers = spark.range(10000000L, 10005000L).toDF("o_orderkey")
    val fp = Sketches.bloomProbe(nonMembers, "o_orderkey", bloom).count()
    // designed rate (1 - e^{-kn/m})^k is well under 1% at sf0.001's
    // build cardinality; allow 10x slack for hash clumping
    assert(fp < 50, s"false positives $fp of 5000")
    bloom.unpersist()
  }

  test("two-phase SNM rank equals a single global row_number") {
    val pairs = Dedup.sortedNeighborhoodPairs(docs, 4, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: global window rank (fine at test scale), same window
    val sh = Dedup.simhashFingerprints(docs)
    val ranked = sh.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("simhash", "doc_id")))
    val ref = ranked.as("a").join(ranked.as("b"),
        col("b.rank") > col("a.rank") && col("b.rank") <= col("a.rank") + 4)
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === ref && pairs.nonEmpty)
  }

  test("sorted-neighborhood finds the planted near-dups that simhash prefix bucketing finds") {
    // adjacent fingerprints sort adjacently: SNM at the same Hamming cut
    // should recover most prefix-bucket pairs (window misses are allowed,
    // catastrophic loss is not)
    val snm = Dedup.sortedNeighborhoodPairs(docs, 4, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.simhashPairs(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm.nonEmpty && bucketed.nonEmpty)
    val recall = (snm intersect bucketed).size.toDouble / bucketed.size
    assert(recall >= 0.5, s"SNM recall vs prefix bucketing: $recall")
  }

  test("chunkDupStats: chunk counts match token counts; planted dups are heavily covered") {
    val stats = Dedup.chunkDupStats(docs, 16).collect()
    val tokCounts = graft.text.Shingles.tokensWithPos(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val id = r.getLong(0); val nChunks = r.getLong(1); val dup = r.getLong(2)
      assert(nChunks === tokCounts(id) / 16, s"doc $id chunk count")
      assert(dup >= 0 && dup <= nChunks)
    }
    // whole-doc planted dups share every aligned chunk except possibly
    // the one holding the extra token
    assert(stats.exists(r => r.getLong(2) === r.getLong(1) && r.getLong(1) > 0))
  }

  test("dedupEvents keeps exactly one earliest event per (user, type, window)") {
    val ev = graft.core.Tables.events(spark, dir)
    val kept = EventOps.dedupEvents(ev, 600)
    // one survivor per group
    val groups = ev.groupBy(col("user_id"), col("event_type"),
      expr("CAST(ts AS LONG) DIV 600")).count()
    assert(kept.count() === groups.count())
    // each survivor is the group's min (ts, event_id) — verify by
    // anti-joining against a window-ranked reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"), expr("CAST(ts AS LONG) DIV 600"))
      .orderBy(col("ts"), col("event_id"))
    val ref = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id")
    assert(kept.select("event_id").exceptAll(ref).count() === 0)
  }

  test("oovRate: full-vocabulary coverage means zero OOV everywhere") {
    val rows = TextOps.oovRate(docs, 1000000).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) === 0L, s"doc ${r.getLong(0)} has OOV under full vocab"))
    val small = TextOps.oovRate(docs, 5).collect()
    assert(small.exists(_.getLong(2) > 0), "tiny vocab must produce OOV tokens")
  }

  test("quantileSketchMerge: constant column (hi == lo) is guarded — bucket 0, no NaN, bounds hold") {
    // r9 ADVICE: the raw width (hi-lo)/256 is 0 on a constant column →
    // NaN buckets and a cross-engine divergence; the ε-floored width
    // must put everything in bucket 0 and keep the bound booleans true
    val li = graft.core.Tables.lineitem(spark, dir)
      .withColumn("l_extendedprice", lit(42.5))
    val r = graft.ops.Relational.quantileSketchMerge(li).collect().head
    // degenerate width is exactly 1.0, so estimates sit one unit above
    // the constant and the bound booleans hold with equality
    assert(math.abs(r.getAs[Double]("p50_est") - 43.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("p99_est") - 43.5) < 1e-9)
    assert(r.getAs[Boolean]("p50_within_grid"))
    assert(r.getAs[Boolean]("p90_within_grid"))
    assert(r.getAs[Boolean]("p99_within_grid"))
  }

  test("quantileSketchMerge: large-offset narrow-range domain keeps the true bucket width") {
    // regression for the r10 review finding: a magnitude-relative ε
    // floor would read ε ≈ |hi|·1e-9 = 1e3 here — 2500× the true bucket
    // width (1e2/256) — collapsing the sketch into bucket 0 while the
    // within_grid booleans stay vacuously true. The guard must fire
    // ONLY on hi == lo; this domain must bin on the real grid.
    val li = graft.core.Tables.lineitem(spark, dir)
      .withColumn("l_extendedprice",
        lit(1e12) + (col("l_orderkey") % 101).cast("double"))
    val r = graft.ops.Relational.quantileSketchMerge(li).collect().head
    val width = 100.0 / 256.0
    // the estimate must track the exact percentile at bucket-width
    // resolution — impossible if the width were ε-inflated to 1e3
    assert(math.abs(r.getAs[Double]("p50_est") - r.getAs[Double]("exact_p50"))
      <= width * (1.0 + 1e-6))
    assert(math.abs(r.getAs[Double]("p99_est") - r.getAs[Double]("exact_p99"))
      <= width * (1.0 + 1e-6))
    assert(r.getAs[Boolean]("p50_within_grid"))
    assert(r.getAs[Boolean]("p99_within_grid"))
    // and the sketch must actually spread across buckets: p99 ≫ p50
    assert(r.getAs[Double]("p99_est") - r.getAs[Double]("p50_est") > 10 * width)
  }

  test("shardAssign partitions the corpus exactly and near-uniformly") {
    val rows = TextOps.shardAssign(docs, 16).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    // md5 sharding of 500 ids across 16 shards: no shard should be
    // pathologically empty or dominant
    val counts = rows.map(_.getLong(1))
    assert(counts.min > 5 && counts.max < 100, counts.mkString(","))
  }
}
