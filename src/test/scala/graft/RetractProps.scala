package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Classify

/** ScalaCheck property for the count-store retraction folds: for
  * ARBITRARY corpus splits and batch orders, folding batches in and
  * retracting one is bit-identical to never having folded it — the
  * associativity-under-subtraction claim the declared q_nb_retracted
  * pins on one split, generalized.
  */
object RetractProps extends Properties("CountRetract") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee")
  private val sources = Vector("s1", "s2", "s3")

  // (docs, batch assignment per doc in {0,1,2}): batch 0 seeds the
  // store, batches 1 and 2 fold in, a random one of them retracts
  private val genCase: Gen[(List[(Long, String, String)], List[Int], Int)] = for {
    n <- Gen.chooseNum(6, 10)
    texts <- Gen.listOfN(n, Gen.chooseNum(0, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    srcs <- Gen.listOfN(n, Gen.oneOf(sources))
    batches <- Gen.listOfN(n, Gen.chooseNum(0, 2))
    retract <- Gen.chooseNum(1, 2)
  } yield (texts.zip(srcs).zipWithIndex.map { case ((t, s), i) =>
    (i.toLong, s, t) }, batches, retract)

  private def df(c: Seq[(Long, String, String)]) = {
    import spark.implicits._
    c.toDF("doc_id", "source", "text")
  }

  private def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  property("fold batches then retract one == never folded it, for arbitrary " +
      "splits (zero-token docs and empty batches included)") =
    forAll(genCase) { case (docs, batches, retract) =>
      val byBatch = (0 to 2).map(b =>
        docs.zip(batches).collect { case (d, bb) if bb == b => d })
      val dir = java.nio.file.Files
        .createTempDirectory("graft-retract-prop").toString + "/c"
      Classify.writeNbCounts(df(byBatch(0)), dir)
      Classify.updateNbCountsBatch(spark, dir, df(byBatch(1)), 0L, "ingest")
      Classify.updateNbCountsBatch(spark, dir, df(byBatch(2)), 1L, "ingest")
      Classify.retractNbCountsBatch(spark, dir, df(byBatch(retract)), 0L, "scrub")
      val kept = (0 to 2).filter(_ != retract).flatMap(byBatch)
      rows(Classify.readNbCounts(spark, dir)) == rows(Classify.nbCounts(df(kept)))
    }
}
