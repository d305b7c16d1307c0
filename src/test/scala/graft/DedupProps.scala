package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Dedup

/** ScalaCheck properties for the dedup pipelines on small generated
  * corpora (each check runs Spark jobs; counts kept low).
  */
object DedupProps extends Properties("Dedup") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private val vocab = Vector("aa", "bb", "cc", "dd")

  // corpora with planted near-dups: base docs plus a mutated copy
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 4)
    base <- Gen.listOfN(n, Gen.chooseNum(4, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    dupOf <- Gen.chooseNum(0, n - 1)
  } yield {
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    docs :+ (n.toLong, base(dupOf) + " zz")
  }

  private def df(c: Seq[(Long, String)]) = {
    import spark.implicits._
    c.toDF("doc_id", "text")
  }

  property("jaccardPairs respects the threshold and canonical d1<d2 order") =
    forAll(genCorpus) { c =>
      val pairs = Dedup.jaccardPairs(df(c), n = 2, threshold = 0.5).collect()
      pairs.forall { r =>
        r.getLong(0) < r.getLong(1) && r.getDouble(5) >= 0.5 && r.getDouble(5) <= 1.0
      }
    }

  property("jaccardPairs is invariant under document order") =
    forAll(genCorpus) { c =>
      val a = Dedup.jaccardPairs(df(c), 2, 0.5).collect().map(_.toString).sorted.toSeq
      val b = Dedup.jaccardPairs(df(c.reverse), 2, 0.5).collect().map(_.toString).sorted.toSeq
      a == b
    }

  property("minhash candidate estimates are multiples of 1/8 in [0.5, 1]") =
    forAll(genCorpus) { c =>
      Dedup.minhashCandidates(df(c), 0.5).collect().forall { r =>
        val e = r.getDouble(2)
        e >= 0.5 && e <= 1.0 && math.abs(e * 8 - math.round(e * 8)) < 1e-12
      }
    }

  property("exactDupGroups partitions all docs: group sizes sum to corpus size") =
    forAll(genCorpus) { c =>
      Dedup.exactDupGroups(df(c)).collect().map(_.getLong(1)).sum == c.size
    }

  // richer dup structure for the deletion property: several mutated
  // copies so clusters have 2-4 members and a random delete set can
  // hit labels, bridges, middles, and singletons in one shot
  private val genDeleteCase: Gen[(List[(Long, String)], Set[Long])] = for {
    n <- Gen.chooseNum(3, 5)
    base <- Gen.listOfN(n, Gen.chooseNum(4, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    m <- Gen.chooseNum(1, 3)
    copies <- Gen.listOfN(m, Gen.chooseNum(0, n - 1))
    docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      copies.zipWithIndex.map { case (src, j) =>
        ((n + j).toLong, base(src) + " zz") }
    // delete any subset EXCEPT everything (an empty corpus is not the
    // lifecycle under test)
    del <- Gen.someOf(docs.map(_._1)).map(_.toSet)
      .suchThat(_.size < docs.size)
  } yield (docs, del)

  property("delete+heal == from-scratch clustering of the scrubbed corpus, " +
      "for ARBITRARY delete sets (labels, bridges, whole clusters, singletons)") =
    forAll(genDeleteCase) { case (docs, del) =>
      import spark.implicits._
      val state = java.nio.file.Files
        .createTempDirectory("dedup-prop-del").toString
      val (b0, b1) = docs.partition(_._1 < docs.size / 2)
      Dedup.clustersIngestBatch(df(b0), 0, state)
      Dedup.clustersIngestBatch(df(b1), 1, state)
      if (del.nonEmpty)
        Dedup.deleteFromDedupState(spark, state, del.toSeq.toDF("doc_id"))
      val healed = Dedup.readClusterAssignment(spark, state)
        .collect().map(_.toString).sorted.toSeq
      val scrubbed = docs.filterNot(d => del.contains(d._1))
      val fromScratch = Dedup.dupClusters(df(scrubbed), 0.5)
        .collect().map(_.toString).sorted.toSeq
      healed == fromScratch
    }
}
