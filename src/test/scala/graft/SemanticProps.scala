package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.sim.Semantic
import graft.tfidf.TfIdf

/** ScalaCheck property tests for the similarity engine (SURVEY.md §5.3,
  * FIXTURES.md A.4). Corpora are kept tiny — each check runs real Spark
  * jobs — and the test count low but > 1 per property.
  */
object SemanticProps extends Properties("Semantic") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsil")

  private val genCorpus: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(2, 6)
    docs <- Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (s"d$i", t) }

  private def df(corpus: Seq[(String, String)]) = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  private def simMap(corpus: Seq[(String, String)], q: String): Map[String, Double] =
    Semantic.relatedTerms(df(corpus), q, k = 100, roundDigits = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  property("symmetry: sim(a→b) == sim(b→a)") =
    forAll(genCorpus, Gen.oneOf(vocab), Gen.oneOf(vocab)) { (c, a, b) =>
      a == b || {
        val ab = simMap(c, a).getOrElse(b, 0.0)
        val ba = simMap(c, b).getOrElse(a, 0.0)
        math.abs(ab - ba) < 1e-9
      }
    }

  property("range: 0 < sim <= 1+eps and never NaN") =
    forAll(genCorpus, Gen.oneOf(vocab)) { (c, q) =>
      simMap(c, q).values.forall(s => s > 0.0 && s <= 1.0 + 1e-9 && !s.isNaN)
    }

  property("idf: log10(m/df), strictly anti-monotone in df") =
    forAll(genCorpus) { c =>
      val m = c.size.toDouble
      val rows = TfIdf.tfidf(df(c))
        .select("term", "df").distinct().collect()
        .map(r => (r.getLong(1), math.log10(m / r.getLong(1))))
      rows.forall { case (d, idf) => math.abs(idf - math.log10(m / d)) < 1e-12 } &&
        rows.sortBy(_._1).sliding(2).forall {
          case Array((d1, i1), (d2, i2)) => d1 == d2 || (d1 < d2) == (i1 > i2)
          case _ => true
        }
    }

  property("document-order invariance") =
    forAll(genCorpus, Gen.oneOf(vocab)) { (c, q) =>
      simMap(c, q) == simMap(c.reverse, q)
    }

  property("perfectly co-occurring terms have sim 1") =
    forAll(Gen.chooseNum(1, 4)) { n =>
      // n docs of "x y" pairs (+1 doc without them so idf(x) > 0)
      val corpus = (0 until n).map(i => (s"d$i", Seq.fill(i + 1)("x y").mkString(" "))) :+
        (s"d$n", "filler words only")
      val s = simMap(corpus, "x")
      Prop(math.abs(s.getOrElse("y", 0.0) - 1.0) < 1e-9) :| s"sims=$s"
    }
}
