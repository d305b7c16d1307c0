package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological.
  *
  * Spark 4's AQE handles skew for sort-merge joins at runtime
  * (spark.sql.adaptive.skewJoin) — that is the default answer. This
  * helper is the explicit pre-salting form for cases AQE does not
  * cover (e.g. a skewed broadcast-side key feeding an aggregation, or
  * when the skew is known ahead of time and replanning mid-query is
  * too late at 100 TB).
  */
object Skew {

  /** Inner equi-join with the large side salted into `saltBuckets`
    * sub-keys and the small side replicated once per bucket. Result is
    * identical to `large.join(small, key)` — the salt is derived
    * deterministically from the large row's content hash, so any salt
    * distribution yields the same join output, just spread over
    * saltBuckets× more (key, salt) groups.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltBuckets: Int = 8): DataFrame = {
    val largeCols = large.columns.map(col).toSeq
    val salted = large.withColumn("__salt",
      pmod(xxhash64(largeCols: _*), lit(saltBuckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
