package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r16): head-to-head micro-benchmark of shingle-pass
  * implementations inside ONE JVM, alternating reps so host drift
  * cancels. Times the full minhash signature aggregate over each
  * variant (the dominant consumer), plus the bare shingle stream.
  */
object ShingleMicroProbe {

  // variant A: explode -> window(lead) -> concat (the pre-r16 shape)
  private def shinglesWindow(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .filter(col("term") =!= "")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("term"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val parts: Seq[Column] = (0 until n).flatMap { i =>
      val t = if (i == 0) col("term") else lead(col("term"), i).over(w)
      if (i == 0) Seq(t) else Seq(lit(" "), t)
    }
    tok.withColumn("span", concat(parts: _*))
      .filter(col("span").isNotNull)
      .select(col("doc_id"), col("span").as("shingle"))
  }

  // variant B: filter -> sequence/transform -> slice + array_join
  private def shinglesSlice(docs: DataFrame, n: Int): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    docs
      .select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"), explode(
        when(size(col("_toks")) >= n,
          transform(sequence(lit(1), size(col("_toks")) - n + 1), j =>
            array_join(slice(col("_toks"), j, lit(n)), " "))))
        .as("shingle"))
  }

  // variant C: filter -> indexed transform + get() + concat, filter nulls
  private def shinglesGet(docs: DataFrame, n: Int): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    docs
      .select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"), explode(
        filter(
          transform(col("_toks"), (t: Column, i: Column) => {
            val parts: Seq[Column] = (0 until n).flatMap { k =>
              val tk = if (k == 0) t else get(col("_toks"), i + k)
              if (k == 0) Seq(tk) else Seq(lit(" "), tk)
            }
            concat(parts: _*)
          }),
          s => s.isNotNull))
        .as("shingle"))
  }

  // positioned spans, variant A: explode -> window(lead)
  private def spansWindow(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .filter(col("term") =!= "")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("term"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val parts: Seq[Column] = (0 until n).flatMap { i =>
      val t = if (i == 0) col("term") else lead(col("term"), i).over(w)
      if (i == 0) Seq(t) else Seq(lit(" "), t)
    }
    tok.withColumn("span", concat(parts: _*))
      .filter(col("span").isNotNull)
      .select("doc_id", "pos", "span")
  }

  // positioned spans, variant B: struct toks + sequence/slice/array_join
  private def spansSlice(docs: DataFrame, n: Int): DataFrame = {
    val toks = filter(
      transform(split(col("text"), " "),
        (t: Column, i: Column) => struct((i + 1).as("pos"), t.as("term"))),
      s => s.getField("term") =!= "")
    docs
      .select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"), inline(
        when(size(col("_toks")) >= n,
          transform(sequence(lit(1), size(col("_toks")) - n + 1), j =>
            struct(
              element_at(col("_toks"), j).getField("pos").as("pos"),
              array_join(
                transform(slice(col("_toks"), j, lit(n)),
                  s => s.getField("term")), " ").as("span"))))))
  }

  // positioned spans, variant C: two flat arrays + get() + concat
  private def spansGet(docs: DataFrame, n: Int): DataFrame = {
    val raw = split(col("text"), " ")
    val terms = filter(raw, t => t =!= "")
    val poss = filter(
      transform(raw, (t: Column, i: Column) => when(t =!= "", i + 1)),
      p => p.isNotNull)
    docs
      .select(col("doc_id"), terms.as("_t"), poss.as("_p"))
      .select(col("doc_id"), inline(
        filter(
          transform(col("_t"), (t: Column, i: Column) => {
            val parts: Seq[Column] = (0 until n).flatMap { k =>
              val tk = if (k == 0) t else get(col("_t"), i + k)
              if (k == 0) Seq(tk) else Seq(lit(" "), tk)
            }
            struct(get(col("_p"), i).as("pos"), concat(parts: _*).as("span"))
          }),
          s => s.getField("span").isNotNull)))
  }

  // variant D: native token_spans expression (one JVM loop per doc)
  private def shinglesExpr(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"),
        inline(call_function("token_spans", col("text"), lit(n))))
      .select(col("doc_id"), col("span").as("shingle"))

  private def spansExpr(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      inline(call_function("token_spans", col("text"), lit(n))))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    graft.functions.GraftFunctions.register(spark)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "window" -> (() => shinglesWindow(docs, 3)),
      "slice " -> (() => shinglesSlice(docs, 3)),
      "get   " -> (() => shinglesGet(docs, 3)),
      "expr  " -> (() => shinglesExpr(docs, 3)))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // sanity: identical output multisets
    val counts = variants.map { case (nm, f) =>
      val c = f().groupBy("doc_id", "shingle").count()
        .agg(count(lit(1)), sum(xxhash64(col("doc_id"), col("shingle"), col("count")).cast("decimal(38,0)"))).head
      (nm, c.getLong(0), c.getDecimal(1))
    }
    counts.foreach { case (nm, n, h) => println(s"[sanity] $nm n=$n hash=$h") }

    // warmup
    variants.foreach { case (_, f) => noop(f()) }
    variants.foreach { case (_, f) =>
      noop(Dedupish.sigs(f()))
    }

    val reps = 9
    val tG = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until reps) {
      // rotate order each rep so position-in-rep bias cancels
      val order = (0 until variants.size).map(i => variants((i + r) % variants.size))
      order.foreach { case (nm, f) =>
        val t0 = System.nanoTime(); noop(Dedupish.sigs(f()))
        tG(nm) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (nm, _) =>
      val ts = tG(nm)
      println(f"[micro] $nm sigs min=${ts.min}%6.3f med=${ts.sorted.apply(ts.size / 2)}%6.3f max=${ts.max}%6.3f")
    }

    val spanVariants: Seq[(String, () => DataFrame)] = Seq(
      "swindow" -> (() => spansWindow(docs, 8)),
      "sslice " -> (() => spansSlice(docs, 8)),
      "sget   " -> (() => spansGet(docs, 8)),
      "sexpr  " -> (() => spansExpr(docs, 8)))
    spanVariants.map { case (nm, f) =>
      val c = f().groupBy("doc_id", "pos", "span").count()
        .agg(count(lit(1)), sum(xxhash64(col("doc_id"), col("pos"), col("span"), col("count")).cast("decimal(38,0)"))).head
      println(s"[sanity] $nm n=${c.getLong(0)} hash=${c.getDecimal(1)}")
    }
    spanVariants.foreach { case (_, f) => noop(f()) }
    val tP = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    for (_ <- 1 to reps) {
      spanVariants.foreach { case (nm, f) =>
        val t0 = System.nanoTime(); noop(f())
        tP(nm) += (System.nanoTime() - t0) / 1e9
      }
    }
    spanVariants.foreach { case (nm, _) =>
      println(f"[micro] $nm spans=${tP(nm) / reps}%6.3fs")
    }
    spark.stop()
  }
}

private object Dedupish {
  def sigs(sh: DataFrame): DataFrame =
    graft.ops.Dedup.minhashSignaturesFromShingles(sh)
}
