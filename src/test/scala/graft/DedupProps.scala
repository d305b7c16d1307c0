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
}
