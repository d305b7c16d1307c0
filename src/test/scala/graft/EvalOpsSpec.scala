package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{TextOps, VectorOps}

/** Behavior tests for the eval/mining operators (hard negatives,
  * retrieval metrics, Zipf fit) beyond what the DuckDB oracle hash
  * pins: the invariants here are cross-checked against independent
  * driver-side recomputation, not against the implementation's own
  * join chain.
  */
class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.embeddings(spark, dir)
  private def docs = graft.core.Tables.documents(spark, dir)

  /** Driver-side exact cosine with the engine's 6dp HALF_UP rounding. */
  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def collectVecs(): Map[Long, (Array[Double], Int)] =
    emb.select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getInt(2))).toMap

  test("hardNegatives: never a same-label row, ranks contiguous, equals brute-force mining") {
    val hn = VectorOps.hardNegatives(emb, col("vec_id") < 5, 10).collect()
    val vecs = collectVecs()
    val byQ = hn.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    for ((qid, rows) <- byQ) {
      val (qv, qlab) = vecs(qid)
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to 10))
      rows.foreach(r => assert(r.getInt(4) != qlab, s"same-label negative: $r"))
      // independent recomputation: top-10 different-label by (cos desc, vid)
      val expected = vecs.toSeq
        .filter { case (vid, (_, lab)) => vid != qid && lab != qlab }
        .map { case (vid, (v, _)) => (vid, cos6(qv, v)) }
        .sortBy { case (vid, c) => (-c, vid) }
        .take(10).map(_._1)
      val got = rows.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq
      assert(got === expected, s"qid $qid mined set diverges from brute force")
    }
  }

  test("retrievalEval: metrics agree with driver-side recomputation per query") {
    val ev = VectorOps.retrievalEval(emb, col("vec_id") < 20, 10).collect()
    val vecs = collectVecs()
    assert(ev.length === 20)
    for (r <- ev) {
      val qid = r.getLong(0)
      val (qv, qlab) = vecs(qid)
      val ranked = vecs.toSeq
        .filter { case (vid, _) => vid != qid }
        .map { case (vid, (v, lab)) => (vid, lab, cos6(qv, v)) }
        .sortBy { case (vid, _, c) => (-c, vid) }
        .take(10)
      val hits = ranked.count(_._2 == qlab)
      val firstRank = ranked.zipWithIndex.collectFirst {
        case ((_, lab, _), i) if lab == qlab => i + 1
      }
      val nRel = vecs.values.count(_._2 == qlab) - 1
      assert(r.getInt(1) === qlab)
      assert(r.getLong(2) === nRel.toLong)
      assert(r.getLong(3) === hits.toLong, s"hits mismatch for qid $qid")
      assert(r.getInt(4) === firstRank.getOrElse(0))
      assert(r.getDouble(5) === firstRank.map(1.0 / _).getOrElse(0.0))
      assert(r.getDouble(6) === hits / 10.0)
      assert(r.getDouble(7) === (if (nRel > 0) hits.toDouble / nRel else 0.0))
    }
  }

  test("contrastiveTriplets: pos/neg sides equal brute-force argmax per anchor") {
    val tr = VectorOps.contrastiveTriplets(emb, col("vec_id") < 20).collect()
    val vecs = collectVecs()
    assert(tr.nonEmpty)
    for (r <- tr) {
      val qid = r.getLong(0)
      val (qv, qlab) = vecs(qid)
      assert(r.getInt(1) === qlab)
      def best(samePred: Int => Boolean): (Long, Double) =
        vecs.toSeq
          .filter { case (vid, (_, lab)) => vid != qid && samePred(lab) }
          .map { case (vid, (v, _)) => (vid, cos6(qv, v)) }
          .minBy { case (vid, c) => (-c, vid) }
      val (pv, pc) = best(_ == qlab)
      val (nv, nc) = best(_ != qlab)
      assert(r.getLong(2) === pv && r.getDouble(3) === pc, s"pos mismatch: $r")
      assert(r.getLong(4) === nv && r.getDouble(5) === nc, s"neg mismatch: $r")
      assert(r.getDouble(6) === pc - nc)
    }
  }

  test("labelPropagation: seeds clamped, two tight clusters fully and correctly labeled") {
    import spark.implicits._
    // two clusters of identical vectors (within-cluster cos = 1, so
    // every member shares all LSH buckets with its cluster); one seed
    // per cluster (vec_id 0 and 5 under seedMod 5)
    val a = Array.fill(64)(0.0f); a(0) = 1.0f
    val b = Array.fill(64)(0.0f); b(1) = 1.0f
    val rows = (0L until 10L).map { i =>
      val inA = i < 5
      (i, (if (inA) a else b).toSeq, if (inA) 1 else 2)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
    val out = VectorOps.labelPropagation(emb, 4, 4, 64, 3, 5).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(out.size === 10)
    for ((vid, (lab, isSeed, prop, correct)) <- out) {
      assert(prop === lab, s"node $vid propagated $prop != true $lab")
      assert(correct === 1)
      assert((isSeed == 1) === (vid % 5 == 0))
    }
  }

  test("labelPropagation on the corpus: seeds keep their label, coverage ⊇ seeds") {
    val out = VectorOps.labelPropagation(emb, 4, 4, 64, 3, 5).collect()
    val seeds = out.filter(_.getInt(2) == 1)
    assert(seeds.nonEmpty)
    seeds.foreach(r => assert(r.getInt(3) === r.getInt(1), s"seed relabeled: $r"))
    val labeled = out.count(_.getInt(3) != -1)
    assert(labeled >= seeds.length)
  }

  test("weighted label propagation resists a planted wrong-label-majority bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // node 100: five barely-similar label-0 neighbors (planted hot
    // bucket) vs two highly-similar label-1 neighbors. Count voting
    // follows the majority; similarity-mass voting must not.
    val scored = Seq(
      (100L, 1L, 200000L), (100L, 2L, 150000L), (100L, 3L, 150000L),
      (100L, 4L, 180000L), (100L, 5L, 190000L),
      (100L, 10L, 950000L), (100L, 11L, 940000L)).toDF("v1", "v2", "wq")
    val edges = scored.select(col("v1").as("src"), col("v2").as("dst"), col("wq"))
      .union(scored.select(col("v2"), col("v1"), col("wq")))
    val seeds = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0), (5L, 0),
      (10L, 1), (11L, 1)).toDF("vec_id", "plab")
    val weighted = VectorOps.propagateWeightedRound(edges, seeds, seeds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(weighted(100L) === 1, "weighted vote must follow similarity mass")
    // wq = 1 on every edge reproduces the unweighted count vote — the
    // same function demonstrates the failure the weights fix
    val unweighted = VectorOps.propagateWeightedRound(
      edges.withColumn("wq", lit(1L)), seeds, seeds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(unweighted(100L) === 0, "count vote follows the planted majority")
  }

  test("auto band-sizing wrappers: generous budget picks the smallest setting, output equals explicit") {
    // pairsPerVector = 1e9 admits every setting, so auto must choose
    // settings.min and produce exactly the explicit-dial result — the
    // wrappers are the 100 TB entry points, so they get driven here
    // even though declared queries pin explicit settings
    val (p, out) = VectorOps.labelPropagationAuto(emb, 4, 64, 1, 5,
      pairsPerVector = 1e9)
    assert(p === 2)
    val explicit = VectorOps.labelPropagation(emb, 2, 4, 64, 1, 5)
    assert(out.orderBy("vec_id").collect().toSeq ===
      explicit.orderBy("vec_id").collect().toSeq)
    val (pd, outd) = graft.ops.Dedup.embeddingNearDupLshAuto(emb, 4, 64, 5,
      pairsPerVector = 1e9)
    assert(pd === 2)
    val explicitD = graft.ops.Dedup.embeddingNearDupLsh(emb, 2, 4, 64, 5)
    assert(outd.collect().toSeq === explicitD.collect().toSeq)
  }

  test("autoPlanesPerBand sample mode: the budget shrinks by the rate (discriminating budget)") {
    import graft.text.Shingles
    import org.apache.spark.sql.functions.{concat, lit}
    val rate = 0.25
    val sampledN = emb.filter(
      Shingles.hash32(concat(lit("occ:"), col("vec_id").cast("string")))
        % 100 < 25).count()
    val priced = VectorOps.lshOccupancy(emb, Seq(2, 4, 6, 8), 4, 64,
        samplePct = 25)
      .select("planes_per_band", "candidate_pairs").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val (p0, pairs0) = priced.head
    assert(pairs0 > 0, "corpus too small to price — test precondition")
    // budget chosen so the UNCORRECTED rule (pairs <= B·n) accepts the
    // smallest setting while the rate-corrected rule (pairs <= B·n·rate)
    // must reject it — a reverted '* rate' term fails here, where the
    // samplePct=100 paths cannot see it
    val b = (2.0 * pairs0) / sampledN
    assert(pairs0 <= b * sampledN && pairs0 > b * sampledN * rate)
    val expected = priced.find(_._2 <= b * sampledN * rate).map(_._1)
      .getOrElse(8)
    assert(expected != p0)
    assert(VectorOps.autoPlanesPerBand(emb, Seq(2, 4, 6, 8), 4, 64, b, 25)
      === expected)
    // zero budget: nothing passes → the settings.max fallback
    val expectedZero = priced.find(_._2 <= 0L).map(_._1).getOrElse(8)
    assert(VectorOps.autoPlanesPerBand(emb, Seq(2, 4, 6, 8), 4, 64, 0.0, 25)
      === expectedZero)
  }

  test("labelPropagationWeighted: convergence column bounded; seeds never churn") {
    val out = VectorOps.labelPropagationWeighted(emb, 4, 4, 64, 3, 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lcr = r.getInt(5)
      assert(lcr >= 0 && lcr <= 3, s"last_changed_round out of range: $r")
      if (r.getInt(2) == 1) {
        assert(lcr === 0, s"seed churned: $r")
        assert(r.getInt(3) === r.getInt(1), s"seed relabeled: $r")
      }
    }
  }

  test("ngramNovelty: rates in [0,1]; fully-duplicated corpus reads zero novelty") {
    val out = TextOps.ngramNovelty(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // every doc identical → every test bigram type exists in train
    import spark.implicits._
    val dup = (0L until 40L).map(i => (i, "alpha beta gamma alpha beta", "s"))
      .toDF("doc_id", "text", "source")
    val z = TextOps.ngramNovelty(dup).collect()
    assert(z.forall(_.getLong(2) == 0L), s"novelty nonzero on duplicated corpus")
  }

  test("phraseSearch equals driver-side brute force over adjacent token pairs") {
    val out = TextOps.phraseSearch(docs, 20).collect()
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pairs = texts.flatMap { case (did, t) =>
      val toks = t.split(" ", -1)
      // raw split positions: a pair exists where BOTH positions are
      // non-empty and adjacent (the tokensWithPos convention)
      (0 until toks.length - 1).collect {
        case i if toks(i).nonEmpty && toks(i + 1).nonEmpty =>
          (did, toks(i), toks(i + 1))
      }
    }
    val (w1, w2) = pairs.groupBy(p => (p._2, p._3))
      .map { case (k, v) => (k, v.length) }.toSeq
      .minBy { case ((a, b), n) => (-n, a, b) }._1
    val byDoc = pairs.filter(p => p._2 == w1 && p._3 == w2)
      .groupBy(_._1).map { case (d, v) => (d, v.length.toLong) }.toSeq
      .sortBy { case (d, n) => (-n, d) }.take(20)
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) == s"$w1 $w2"), "phrase mismatch")
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq === byDoc)
  }

  test("phraseSearchK(3) equals driver-side brute force over adjacent trigrams") {
    val out = TextOps.phraseSearchK(docs, 3, 20).collect()
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tris = texts.flatMap { case (did, t) =>
      val toks = t.split(" ", -1)
      (0 until toks.length - 2).collect {
        case i if toks(i).nonEmpty && toks(i + 1).nonEmpty && toks(i + 2).nonEmpty =>
          (did, toks(i), toks(i + 1), toks(i + 2))
      }
    }
    val top = tris.groupBy(p => (p._2, p._3, p._4))
      .map { case (k, v) => (k, v.length) }.toSeq
      .minBy { case ((a, b, c), n) => (-n, a, b, c) }._1
    val byDoc = tris.filter(p => (p._2, p._3, p._4) == top)
      .groupBy(_._1).map { case (d, v) => (d, v.length.toLong) }.toSeq
      .sortBy { case (d, n) => (-n, d) }.take(20)
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) == s"${top._1} ${top._2} ${top._3}"))
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq === byDoc)
  }

  test("phraseSearchK: a phrase never spans a position gap (double space)") {
    import spark.implicits._
    // "a b  c" has positions a=1 b=2 c=4 — (a b c) is NOT adjacent;
    // doc 1 carries the only true adjacent trigram, twice
    val gap = Seq(
      (0L, "a b  c a b  c a b  c", "s"),
      (1L, "a b c x a b c", "s")).toDF("doc_id", "text", "source")
    val hit = TextOps.phraseSearchK(gap, 3, 10).collect()
    assert(hit.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      === Seq((1L, "a b c", 2L)))
  }

  test("phraseSearchK anchors on the phrase's RAREST word, not its first (r9 verdict #2)") {
    import spark.implicits._
    // "the" floods the corpus (huge posting list) and leads the most
    // frequent trigram "the zq xx"; "zq" appears ONLY inside phrase
    // occurrences while "xx" also appears alone — min-df anchor = zq
    val docs = (
      // filler trigram types are unique per doc (a$i/b$i/c$i), so the
      // planted phrase's 6 occurrences win the argmax
      (0L until 30L).map(i => (i, s"the a$i xx the b$i c$i", "s")) :+
        (100L, "the zq xx pad the zq xx pad the zq xx", "s") :+
        (101L, "the zq xx pad the zq xx", "s") :+
        (102L, "the zq xx", "s")
      ).toDF("doc_id", "text", "source")
    val q = TextOps.phraseSearchK(docs, 3, 10)
    // the probe chain's anchor filter must select the rare word — the
    // plan carries the literal, so the choice is pinned structurally
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("= zq)"), s"anchor is not the min-df word:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // and the re-anchored plan returns exactly the right answer
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      === Seq((100L, "the zq xx", 3L), (101L, "the zq xx", 2L), (102L, "the zq xx", 1L)))
  }

  test("metricStability: replicate means equal driver recomputation; spread sane") {
    val out = TextOps.metricStability(docs, 16).collect()
    assert(out.length === 16)
    val lens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = lens.length
    // driver-side recomputation of replicate 3 with the same salt
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val kept3 = lens.filter { case (did, _) => h32(s"boot:3:$did") % 2 == 0 }
    val r3 = out.find(_.getInt(0) == 3).get
    assert(r3.getLong(1) === kept3.length.toLong)
    assert(r3.getDouble(2) ===
      kept3.map(_._2).sum.toDouble / kept3.length.toDouble)
    out.foreach { r =>
      // half-sampling: replicate size within a generous binomial band
      assert(r.getLong(1) > n * 0.35 && r.getLong(1) < n * 0.65, r.toString)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("langConfidence: argmax agrees with langPredictions; margins internally consistent") {
    val conf = TextOps.langConfidence(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val pred = TextOps.langPredictions(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(conf.keySet === pred.keySet)
    for ((did, r) <- conf) {
      assert(r.getString(1) === pred(did), s"doc $did argmax diverges")
      val (top, second, margin) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(top >= second && margin === top - second)
      assert((r.getInt(5) == 1) === (top > 0 && margin >= 2))
      if (r.getString(1) == "und") assert(top == 0 || margin == 0)
    }
  }

  test("triangleStats equals driver-side brute force on the candidate graph") {
    val edges = graft.ops.Dedup.minhashCandidates(docs, 0.5)
      .select(col("d1"), col("d2")).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .filter(p => p._1 != p._2).distinct
    val eset = edges.toSet
    val brute = (for {
      (a, b) <- edges
      (b2, c) <- edges if b2 == b && eset.contains((a, c))
    } yield 1).size
    val deg = edges.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map(_._2.size.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val out = graft.ops.Graph.triangleStats(
      graft.ops.Dedup.minhashCandidates(docs, 0.5)
        .select(col("d1").as("src"), col("d2").as("dst"))).head()
    assert(out.getLong(0) === edges.length.toLong)
    assert(out.getLong(2) === wedges)
    assert(out.getLong(3) === brute.toLong, "triangle count mismatch")
  }

  test("zorder cells bound BOTH dimensions where a single-dim sort cannot") {
    import spark.implicits._
    // scrambled 1024×1024 grid: user and day carry independent signal
    val raw = (0 until 4096).map { i =>
      (((i * 37) % 1024).toLong, ((i * 101) % 1024).toLong)
    }
    val ev = raw.toDF("user_id", "day")
      .select(col("user_id"),
        to_timestamp(from_unixtime(col("day") * 86400L)).as("ts"))
    val zm = graft.ops.EventOps.zorderZonemap(ev).collect()
    assert(zm.nonEmpty)
    // a zcell frees only the low 8 bits of each dimension — both
    // spans are bounded by 255 structurally
    zm.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 255L, s"user span loose: $r")
      assert(r.getLong(5) - r.getLong(4) <= 255L, s"day span loose: $r")
    }
    // the single-dim baseline: day-sorted cells of the same count
    // leave the user span at (nearly) the full range in every cell
    val cells = zm.length
    val chunk = math.max(1, raw.length / cells)
    val daySorted = raw.sortBy { case (u, d) => (d, u) }.grouped(chunk).toSeq
    val baselineSpans = daySorted.map(c => c.map(_._1).max - c.map(_._1).min)
    assert(baselineSpans.forall(_ > 255L),
      s"baseline unexpectedly tight: ${baselineSpans.mkString(",")}")
  }

  test("selfJoinCost: est_pairs equals the actual inverted-index join row count") {
    val cost = graft.ops.Dedup.selfJoinCost(docs, 3, 4).collect()
      .map(r => r.getString(0) -> r).toMap
    val sh = graft.text.Shingles.shingles(docs, 3).distinct()
    val actual = sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id")).count()
    assert(cost("all").getLong(5) === actual,
      s"est_pairs ${cost("all").getLong(5)} != actual join rows $actual")
    // the capped regime is a strict subset on this corpus (max df > 4)
    assert(cost("df<=4").getLong(5) <= actual)
    assert(cost("all").getLong(4) > 4L, "corpus max df unexpectedly <= ceiling")
  }

  test("skewReport: top keys and factors agree with driver-side recomputation") {
    val rep = graft.ops.EventOps.skewReport(
      graft.core.Tables.events(spark, dir), "user_id", 20).collect()
    val cnts = graft.core.Tables.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nRows = cnts.map(_._2).sum
    val top = cnts.sortBy { case (k, c) => (-c, k) }.take(20)
    assert(rep.length === math.min(20, cnts.length))
    for ((r, i) <- rep.sortBy(_.getInt(0)).zipWithIndex) {
      assert(r.getInt(0) === i + 1)
      assert((r.getLong(1), r.getLong(2)) === top(i))
      assert(r.getDouble(5) === top(i)._2.toDouble / nRows.toDouble)
      assert(r.getDouble(6) ===
        top(i)._2.toDouble * cnts.length.toDouble / nRows.toDouble)
    }
  }

  test("lengthQuantiles: banded two-phase rank equals a driver-side global sort") {
    val out = TextOps.lengthQuantiles(docs, Seq(0.5, 0.9, 0.99)).collect()
    val lens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id").count().collect()
      .map(r => (r.getLong(1), r.getLong(0))).sorted // (v, doc_id) ascending
    val n = lens.length
    assert(out.length === 3)
    for (r <- out) {
      val q = r.getDouble(0)
      val rank = math.ceil(q * n).toLong
      val (v, did) = lens((rank - 1).toInt)
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === rank)
      assert(r.getLong(3) === v, s"q=$q value mismatch")
      assert(r.getLong(4) === did, s"q=$q doc mismatch")
    }
  }

  test("sourceLengthQuantiles: per-stratum banded rank equals per-source driver sort") {
    val out = TextOps.sourceLengthQuantiles(docs, Seq(0.5, 0.9, 0.99)).collect()
    val lens = docs
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    val bySrc = lens.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(r => (r._2, r._3)).sorted
    }
    assert(out.length === bySrc.size * 3)
    for (r <- out) {
      val (src, q) = (r.getString(0), r.getDouble(1))
      val sorted = bySrc(src)
      val rank = math.ceil(q * sorted.length).toLong
      val (v, did) = sorted((rank - 1).toInt)
      assert(r.getLong(2) === sorted.length.toLong)
      assert(r.getLong(3) === rank)
      assert(r.getLong(4) === v, s"$src q=$q value mismatch")
      assert(r.getLong(5) === did, s"$src q=$q doc mismatch")
    }
  }

  test("packBins: folded pairing covers every doc once and beats own-bin padding") {
    val bins = TextOps.packBins(docs, 256).collect()
    val lens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id").count().collect()
      .map(r => (math.min(r.getLong(1), 256L), r.getLong(0))).sorted
    val n = lens.length
    assert(bins.map(_.getLong(1)).sum === n.toLong, "docs not covered exactly once")
    assert(bins.map(_.getLong(2)).sum === lens.map(_._1).sum, "token mass not conserved")
    // driver-side folded pairing: rank r (1-based ascending) pairs n+1-r
    val expected = lens.zipWithIndex
      .groupBy { case (_, i) => math.min(i + 1, n - i) }
      .map { case (b, rows) => b.toLong -> rows.map(_._1._1).sum }
    bins.foreach { r =>
      assert(r.getLong(2) === expected(r.getLong(0)), s"bin ${r.getLong(0)} total mismatch")
      assert(r.getLong(4) === 256L - r.getLong(2))
      assert((r.getInt(3) == 1) === (r.getLong(2) <= 256L))
    }
    // the point of folding: mean fill beats the worst doc-per-bin case
    val fillFolded = lens.map(_._1).sum.toDouble / (bins.length * 256.0)
    val fillNaive = lens.map(_._1).sum.toDouble / (n * 256.0)
    assert(fillFolded > fillNaive, "pairing did not reduce window count")
  }

  test("curriculumOrder: ranks contiguous within bands, bands are floor(avg_nll)") {
    val cur = TextOps.curriculumOrder(docs).collect()
    assert(cur.length === docs.count())
    cur.foreach { r =>
      assert(r.getInt(3) === math.floor(r.getDouble(2)).toInt)
    }
    cur.groupBy(_.getInt(3)).foreach { case (b, rows) =>
      val ranks = rows.map(_.getInt(4)).sorted
      assert(ranks.sameElements(1 to rows.length),
        s"band $b ranks not contiguous: ${ranks.take(5).mkString(",")}")
    }
  }

  test("zipfFit: slope negative, R² in (0,1], head term cross-checked") {
    val z = TextOps.zipfFit(docs, 1000).head()
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(z.getLong(0) === math.min(1000L, vocab.length.toLong))
    val (topTerm, topCnt) = vocab.minBy { case (t, n) => (-n, t) }
    assert(z.getString(1) === topTerm)
    assert(z.getLong(2) === topCnt)
    assert(z.getDouble(3) < 0.0, s"Zipf slope not negative: ${z.getDouble(3)}")
    val r2 = z.getDouble(5)
    assert(r2 > 0.0 && r2 <= 1.0, s"R² out of range: $r2")
  }

  test("annRecall: self-recall 1.0, disjoint 0.0, IVFADC recall agrees with driver-side overlap") {
    val exact = VectorOps.knn(emb, col("vec_id") < 5, 10)
    val self = VectorOps.annRecall(exact, exact, 10).collect()
    assert(self.length === 5)
    assert(self.forall(r => r.getAs[Long]("hits") === 10L &&
      r.getAs[Double]("recall") === 1.0))
    // an approx result sharing nothing with exact reads zero, and the
    // query set stays EXACT-side-defined (a dead query still reports)
    val disjoint = exact.withColumn("vid", col("vid") + 1000000L)
    val zero = VectorOps.annRecall(exact, disjoint, 10).collect()
    assert(zero.length === 5)
    assert(zero.forall(r => r.getAs[Long]("hits") === 0L &&
      r.getAs[Double]("recall") === 0.0))
    // the declared query's instance: recall equals the overlap computed
    // driver-side from the two collected top-k sets
    val approx = VectorOps.ivfPqSearch(emb, col("vid") < 5, 8, 8, 16, 10, 64)
    val got = VectorOps.annRecall(exact, approx, 10).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("recall")).toMap
    val exSets = exact.collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vid")).toSet }
    val apSets = approx.collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vid")).toSet }
    assert(got.keySet === exSets.keySet)
    for ((q, ex) <- exSets)
      assert(got(q) === ex.intersect(apSets.getOrElse(q, Set.empty)).size / 10.0,
        s"qid $q recall diverges from driver-side overlap")
    // duplicate (qid, vid) pairs — raw multi-probe/LSH candidate output
    // before ranking dedups it — must not inflate recall past 1.0 on
    // either side of the join
    val dupApprox = exact.union(exact)
    val dedup1 = VectorOps.annRecall(exact, dupApprox, 10).collect()
    assert(dedup1.forall(r => r.getAs[Long]("hits") === 10L &&
      r.getAs[Double]("recall") === 1.0),
      "duplicate approx pairs inflated recall")
    val dedup2 = VectorOps.annRecall(exact.union(exact), exact, 10).collect()
    assert(dedup2.forall(r => r.getAs[Long]("hits") === 10L &&
      r.getAs[Double]("recall") === 1.0),
      "duplicate exact pairs inflated recall")
  }
}
