package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE training/encoding semantics on corpora with KNOWN merge
  * behavior; cross-engine parity of the declared queries rides the
  * DuckDB oracle gate.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("greedy fold merges non-overlapping occurrences left to right") {
    val out = Seq(Tuple1(Seq("a", "a", "a", "a")))
      .toDF("syms")
      .select(Bpe.mergeFold(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    // "aaaa" + (a,a) → [aa, aa]: position 0-1 merges, the NEW symbol
    // does not re-merge with position 2 in the same pass, 2-3 merges
    assert(out == Seq("aa", "aa"))
    val odd = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("syms")
      .select(Bpe.mergeFold(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(odd == Seq("aa", "a"))
  }

  test("trains the classic most-frequent-pair sequence") {
    // "ab" appears in every word, weighted by word frequency:
    // abab×3 contributes 2·3=6, abc×2 contributes 2 → (a,b) count 8.
    // After that merge: abab→[ab,ab] (pair (ab,ab) ×3), abc→[ab,c] ×2.
    val d = docs("abab abab abab abc abc")
    val (merges, finalSyms) = Bpe.train(d, 2)
    assert(merges.map(m => (m.lft, m.rgt, m.pair_count)) ==
      Seq(("a", "b", 8L), ("ab", "ab", 3L)))
    val syms = finalSyms.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(syms("abab") == Seq("abab"))
    assert(syms("abc") == Seq("ab", "c"))
  }

  test("tie-break is (count desc, left asc, right asc)") {
    // "xy" and "ab" both appear exactly twice; (a,b) < (x,y) wins
    val d = docs("xy xy ab ab")
    val (merges, _) = Bpe.train(d, 1)
    assert(merges.head.lft == "a" && merges.head.rgt == "b" && merges.head.pair_count == 2L)
  }

  test("encode: subword counts shrink as merges grow, fingerprint is order-pinned") {
    val d = docs("abab abc", "abab abab")
    val e1 = Bpe.bpeEncode(d, 1).orderBy("doc_id").collect()
    val e2 = Bpe.bpeEncode(d, 2).orderBy("doc_id").collect()
    // doc 0: "abab abc" = 7 chars; after (a,b): [ab,ab] + [ab,c] = 4 subwords
    assert(e1(0).getLong(1) == 2L && e1(0).getLong(2) == 4L)
    // more merges can only keep or shrink the subword count
    assert(e2(0).getLong(2) <= e1(0).getLong(2))
    assert(e2(1).getLong(2) <= e1(1).getLong(2))
    // same doc text → same fingerprint across distinct doc rows? No —
    // fingerprints pin content: distinct content differs
    assert(e1(0).getString(3) != e1(1).getString(3))
  }

  test("fold invariants on random symbol arrays: lossless and complete") {
    // one DataFrame of 500 seeded-random arrays over a tiny alphabet
    // (maximizing adjacent collisions), one Spark pass, all rows checked:
    // (1) LOSSLESS — concatenating the output reproduces the input;
    // (2) COMPLETE — no adjacent (lft, rgt) pair survives the pass
    //     (the merged symbol is lft+rgt, never equal to lft alone, so a
    //     surviving pair would mean the fold skipped a merge site)
    val rng = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "ba")
    val rows = Seq.tabulate(500) { _ =>
      Tuple1(Seq.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.size))))
    }
    val out = rows.toDF("syms")
      .select(col("syms"), Bpe.mergeFold(col("syms"), "a", "b").as("m"))
      .collect()
    out.foreach { r =>
      val in = r.getSeq[String](0); val m = r.getSeq[String](1)
      assert(m.mkString("") == in.mkString(""), s"lossy: $in -> $m")
      assert(!m.init.lazyZip(m.tail).exists { case (x, y) => x == "a" && y == "b" },
        s"unmerged adjacency survived: $in -> $m")
    }
  }

  test("incremental pair-count trainer equals the full recount, merge for merge") {
    // counts drive the argmax, so equality of the full Merge rows
    // (symbols AND counts, all k steps) pins the delta maintenance
    val tiny = docs("abab abab abab abc abc", "xy xy ab ba baba")
    assert(Bpe.trainIncremental(tiny, 6) == Bpe.train(tiny, 6)._1)
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Bpe.trainIncremental(corpus, 16) == Bpe.train(corpus, 16)._1)
  }

  test("postings-index trainer equals the full recount, merge for merge") {
    // the production rung: affected words come from the pair→word
    // postings lookup, the fold runs only on them — and the merge
    // sequence (symbols AND counts, every step) must be unchanged
    val tiny = docs("abab abab abab abc abc", "xy xy ab ba baba")
    assert(Bpe.trainPostings(tiny, 6) == Bpe.train(tiny, 6)._1)
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Bpe.trainPostings(corpus, 16) == Bpe.train(corpus, 16)._1)
  }

  test("bpeEncodeWith: a pretrained merge table serves without retraining") {
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.bpeMerges(corpus, 8).collect().map(r =>
      Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // self-application == the train-and-encode query, row for row
    val viaModel = Bpe.bpeEncodeWith(corpus, merges)
      .collect().map(_.toString).sorted
    val viaTrain = Bpe.bpeEncode(corpus, 8)
      .collect().map(_.toString).sorted
    assert(viaModel.sameElements(viaTrain))
    // cross-corpus: fresh text with unseen words still encodes (unseen
    // words fall through to characters), and every token is covered
    val fresh = docs("brandnew wordsx the of", "qqq zzz the")
    val out = Bpe.bpeEncodeWith(fresh, merges).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).sum == 7, "every token of the fresh corpus encodes")
  }

  test("sampled-corpus training reproduces most of the full merge sequence") {
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Bpe.bpeMerges(corpus, 16).select("merged").collect().map(_.getString(0)).toSet
    val samp = Bpe.bpeMerges(corpus, 16, samplePct = 30)
      .select("merged").collect().map(_.getString(0)).toSet
    // pair statistics concentrate: a 30% deterministic sample must
    // recover well over half of the k=16 merge symbols (the exact
    // sequence may reorder — counts differ — but the learned vocab
    // overlaps heavily)
    assert((full & samp).size >= 10, s"overlap ${(full & samp).size}: $full vs $samp")
  }

  test("declared queries run and agree on corpus shape at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val merges = SparkEntry.queries("q_bpe_merges")(spark, dir).collect()
    assert(merges.length == 8)
    // merge table is a valid chain: every step's count is positive and
    // counts are non-increasing is NOT guaranteed (later merges can
    // count higher after symbol growth) — but steps must be 1..8
    assert(merges.map(_.getInt(0)).toSeq == (1 to 8))
    val enc = SparkEntry.queries("q_bpe_encode")(spark, dir)
    val row = enc.agg(
      count(lit(1)), sum(col("n_tokens")), sum(col("n_subwords"))).head()
    val docsN = graft.core.Tables.documents(spark, dir).count()
    assert(row.getLong(0) == docsN, "every document encodes")
    assert(row.getLong(2) >= row.getLong(1), "every token is at least one subword")
    // round-trip over the real vocab: 8 merges applied in sequence are
    // still lossless for every distinct corpus word
    val finalSyms = Bpe.train(graft.core.Tables.documents(spark, dir), 8)._2
    assert(finalSyms.filter(concat_ws("", col("syms")) =!= col("word")).count() == 0)
  }
}
