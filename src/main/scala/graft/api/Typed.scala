package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.Tables
import graft.sim.Semantic

/** Typed facade over the engine: case-class Datasets where compile-time
  * field checks help, converting to DataFrames internally (DataFrame is
  * the engine currency — Catalyst-optimizable, schema-dynamic).
  */
object Typed {

  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class TermScore(term: String, sim: Double)
  case class Moments(n: Long, mean: Double, variance: Double)

  def documents(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).as[Doc]
  }

  def relatedTerms(docs: Dataset[Doc], query: String, k: Int = 5): Dataset[TermScore] = {
    implicit val enc: Encoder[TermScore] = Encoders.product[TermScore]
    Semantic.relatedTerms(docs.toDF(), query, k).as[TermScore]
  }

  /** Typed single-pass moments Aggregator (Welford-free sum-of-squares
    * form; for reproducibility-critical paths use the decimal-sum
    * formulation in Relational.q_stats_agg instead).
    */
  class MomentsAgg extends Aggregator[Double, (Long, Double, Double), Moments] {
    def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) =
      (b._1 + 1, b._2 + x, b._3 + x * x)
    def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    def finish(r: (Long, Double, Double)): Moments = {
      val n = r._1
      if (n < 2) Moments(n, if (n == 0) 0.0 else r._2 / n, 0.0)
      else Moments(n, r._2 / n, (r._3 - r._2 * r._2 / n) / (n - 1))
    }
    def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }
}
