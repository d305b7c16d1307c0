package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, TextOps}

/** Invariants for the round-5 pipeline operators (SCD2, temperature
  * mixing, reproducible shuffle) beyond the DuckDB hash gate.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)
  private def events = graft.core.Tables.events(spark, dir)

  test("leakage-safe split: clusters never straddle splits; doc-hash split does leak") {
    import org.apache.spark.sql.functions._
    val split = graft.ops.Curation.leakageSafeSplit(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every doc assigned exactly once
    assert(split.count() === docs.count())
    // the invariant the operator exists for: one split per cluster
    val straddling = split.groupBy("split_key")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddling === 0L)
    // and it's not vacuous: at least one real cluster (size > 1) exists
    val clustered = split.groupBy("split_key").count().filter(col("count") > 1).count()
    assert(clustered > 0L, "no multi-doc cluster in the fixture — invariant untested")
    // contrast: the plain doc-hash split DOES separate at least one
    // near-dup pair on this corpus (the leakage this operator prevents)
    val docHash = docs.select(col("doc_id"),
      when(graft.ops.TextOps.hashBucket(col("doc_id")) < 80, "train")
        .when(graft.ops.TextOps.hashBucket(col("doc_id")) < 90, "valid")
        .otherwise("test").as("split"))
    val leaked = split.select("doc_id", "split_key")
      .join(docHash, "doc_id")
      .groupBy("split_key").agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(leaked > 0L, "doc-hash split never leaked here — contrast case is vacuous")
    split.unpersist()
  }

  test("scd2: versions tile the timeline, exactly one current row per user") {
    val dim = EventOps.scd2(events, "purchase").collect()
    val byUser = dim.groupBy(_.getLong(0))
    byUser.foreach { case (user, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), s"user $user versions")
      // each version's valid_to is the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3), s"user $user interval gap")
        case _ => ()
      }
      assert(rows.count(_.getBoolean(5)) == 1, s"user $user current rows")
      assert(sorted.last.isNullAt(4), s"user $user open-ended tail")
    }
    assert(dim.length == events.filter(col("event_type") === "purchase").count())
  }

  test("mix temperature: weights normalize to 1 and flatten the distribution") {
    val rows = TextOps.sourceMixTemperature(docs).collect()
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    // α = 1/2 flattening: the effective share of the largest source
    // shrinks vs its raw share, the smallest source's grows
    val total = rows.map(_.getLong(1)).sum.toDouble
    val biggest = rows.maxBy(_.getLong(1))
    val smallest = rows.minBy(_.getLong(1))
    assert(biggest.getDouble(2) <= biggest.getLong(1) / total + 1e-12)
    assert(smallest.getDouble(2) >= smallest.getLong(1) / total - 1e-12)
  }

  test("pca power iteration: unit norm, recovers a planted dominant direction") {
    import spark.implicits._
    // vectors spread along axis 0 with small fixed axis-1 offsets: the
    // top principal component must be ±e0
    val planted = Seq(
      (0L, Array(4.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Array(-4.0f, -0.1f, 0.1f, 0.0f)),
      (2L, Array(2.0f, 0.0f, -0.1f, 0.1f)),
      (3L, Array(-2.0f, 0.1f, 0.0f, -0.1f)),
      (4L, Array(1.0f, -0.1f, 0.1f, 0.0f)),
      (5L, Array(-1.0f, 0.0f, -0.1f, 0.1f))).toDF("vec_id", "embedding")
    val pc = graft.ops.VectorOps.principalDirection(planted, 4, 4)
      .orderBy("dim").collect().map(_.getDouble(2))
    val norm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"pc1 norm $norm")
    assert(math.abs(pc(0)) > 0.99, s"pc1 not along planted axis: ${pc.toSeq}")
  }

  test("encodeTokens: OOV counts agree with oovRate; planted doc encodes exactly") {
    import spark.implicits._
    val enc = TextOps.encodeTokens(docs, 20)
      .select("doc_id", "n_oov").as[(Long, Long)].collect().toMap
    val oov = TextOps.oovRate(docs, 20)
      .select("doc_id", "oov_tokens").as[(Long, Long)].collect().toMap
    assert(enc === oov, "the encoder and the coverage metric must agree on OOV")
    // planted: vocab ranks are count-desc then lexicographic; unk = 0
    val tiny = Seq((1L, "b b a c zz"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextOps.encodeTokens(tiny, 3).orderBy("doc_id").collect()
    // counts: b=3, a=2, c=1, zz=1 → vocab b→1 a→2 c→3; zz OOV
    val expected = Seq("1,1,2,3,0", "1,2").map(s =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s))
    assert(out.map(_.getString(3)).toSeq === expected)
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("mergeUpsert: actions partition the key space and carry the right values") {
    import spark.implicits._
    val cutoff = "2024-01-21"
    val merged = EventOps.mergeUpsert(events, cutoff, "purchase").collect()
    val chg = events.filter(col("event_type") === "purchase")
    val before = chg.filter(col("ts") < lit(cutoff).cast("timestamp"))
      .select("user_id").distinct().as[Long].collect().toSet
    val after = chg.filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .select("user_id").distinct().as[Long].collect().toSet
    assert(merged.map(_.getLong(0)).toSet === (before ++ after))
    merged.foreach { r =>
      val (u, action) = (r.getLong(0), r.getString(1))
      val expected =
        if (before(u) && after(u)) "update" else if (after(u)) "insert" else "keep"
      assert(action === expected, s"user $u")
      // updates must change state forward: new value comes from the batch
      if (action == "update") assert(!r.isNullAt(2) && !r.isNullAt(3))
      if (action == "insert") assert(r.isNullAt(2))
      if (action == "keep") assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("dqChecks: clean data passes; planted violations are counted") {
    import spark.implicits._
    val clean = graft.ops.Relational.dqChecks(
      graft.core.Tables.lineitem(spark, dir),
      graft.core.Tables.orders(spark, dir),
      graft.core.Tables.customer(spark, dir)).collect()
    assert(clean.length === 5)
    clean.foreach(r => assert(r.getLong(1) === 0L, s"${r.getString(0)} dirty"))
    clean.foreach(r => assert(r.getLong(2) > 0L))
    // planted: one orphan lineitem, one dup order key, one empty name,
    // one bad quantity, one non-positive price
    val li = Seq((1L, 1L, 5.0), (2L, 99L, 60.0))
      .toDF("l_linenumber", "l_orderkey", "l_quantity")
    val ord = Seq((1L, 10.0), (1L, 20.0), (3L, -5.0))
      .toDF("o_orderkey", "o_totalprice")
    val cust = Seq((1L, "ok"), (2L, "")).toDF("c_custkey", "c_name")
    val dirty = graft.ops.Relational.dqChecks(li, ord, cust)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dirty === Map(
      "1_orphan_lineitems" -> 1L, "2_dup_order_keys" -> 1L,
      "3_null_customer_name" -> 1L, "4_qty_out_of_range" -> 1L,
      "5_nonpositive_order_price" -> 1L))
  }

  test("abtt residuals: Pythagoras holds — loading² + resid² ≈ ‖y‖²") {
    import spark.implicits._
    val planted = Seq(
      (0L, Array(4.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Array(-4.0f, -0.1f, 0.1f, 0.0f)),
      (2L, Array(2.0f, 0.0f, -0.1f, 0.1f)),
      (3L, Array(-2.0f, 0.1f, 0.0f, -0.1f))).toDF("vec_id", "embedding")
    val scored = graft.ops.VectorOps.abttResiduals(planted, 4, 4, 4).collect()
    assert(scored.length === 4)
    // recover the centered rows to check against
    val rows = planted.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val mu = (0 until 4).map(d => rows.map(_._2(d)).sum / rows.length)
    scored.foreach { r =>
      val y = rows.find(_._1 == r.getLong(0)).get._2.zip(mu).map { case (x, m) => x - m }
      val norm2 = y.map(x => x * x).sum
      val pyth = r.getDouble(1) * r.getDouble(1) + r.getDouble(2)
      assert(math.abs(pyth - norm2) < 1e-6, s"vec ${r.getLong(0)}: $pyth vs $norm2")
      assert(r.getDouble(2) >= 0.0)
    }
    // the most-loaded vector must be the ±4 outlier pair's member
    assert(Set(0L, 1L).contains(scored.head.getLong(0)))
  }

  test("shuffle rank: a permutation, equal to the single-window global rank") {
    import org.apache.spark.sql.expressions.Window
    val out = TextOps.shuffleRank(docs)
    val n = docs.count()
    val positions = out.select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(positions.toSeq == (1L to n), "positions must be a permutation of 1..n")
    // the two-phase bucketed rank must equal the naive global window
    val naive = docs
      .select(col("doc_id"),
        graft.text.Shingles.hash32(concat(lit("shuffle:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("pos", row_number().over(Window.orderBy("k", "doc_id")).cast("long"))
      .select("doc_id", "pos")
    val mismatch = out.select(col("doc_id"), col("shuffle_pos"))
      .except(naive.select(col("doc_id"), col("pos").as("shuffle_pos")))
    assert(mismatch.isEmpty, "bucketed rank diverges from the global window")
  }
}
