package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r17): same-JVM rotated A/B of the 32-bit hash
  * implementations — the md5/substring/conv chain vs the native
  * [[graft.functions.Hash32]] kernel — over the dominant consumer
  * (the minhash signature aggregate on the 3-shingle stream) and a
  * bare per-token hash pass.
  */
object Hash32MicroProbe {

  private def chainHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def kernelHash(c: Column): Column =
    graft.functions.ColShim.column(
      graft.functions.Hash32(graft.functions.ColShim.expression(c)))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    val sh = graft.text.Shingles.shingles(docs, 3).localCheckpoint(true)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def sigsWith(h: Column => Column): DataFrame = {
      import graft.ops.Dedup.{P => _}
      // the minhash shape: per-doc mins of affine transforms of h
      val hc = h(col("shingle")).as("h")
      val aggs = (0 until 8).map(i =>
        min((col("h") * lit(1000003L + i) + lit(i * 40503L)) % lit(4294967291L))
          .as(s"sig$i"))
      sh.select(col("doc_id"), hc)
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "chain " -> (() => sigsWith(chainHash)),
      "kernel" -> (() => sigsWith(kernelHash)))

    // sanity: identical values
    val eq = sh.select(chainHash(col("shingle")).as("a"),
        kernelHash(col("shingle")).as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"[sanity] mismatches=$eq")

    variants.foreach { case (_, f) => noop(f()) } // warmup
    val reps = 11
    val t = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until reps) {
      val order = (0 until variants.size).map(i => variants((i + r) % variants.size))
      order.foreach { case (nm, f) =>
        val t0 = System.nanoTime(); noop(f())
        t(nm) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (nm, _) =>
      val ts = t(nm)
      println(f"[micro] $nm min=${ts.min}%6.3f med=${ts.sorted.apply(ts.size / 2)}%6.3f max=${ts.max}%6.3f")
    }
    spark.stop()
  }
}
