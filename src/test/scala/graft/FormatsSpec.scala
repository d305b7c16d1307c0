package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def roundtrips(name: String, write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: (String, org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame): Unit = {
    val src = Tables.lineitem(spark, dir)
    val tmp = Files.createTempDirectory(s"graft-$name").toString + "/t"
    write(src, tmp)
    val back = read(tmp, src.schema)
    assert(back.schema == src.schema, s"$name schema drift")
    val a = src.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b), s"$name value drift")
  }

  test("compactParquet merges a fragmented table into few sorted files, data intact") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    val src = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val frag = java.nio.file.Files.createTempDirectory("frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("compact").toString
    src.repartition(64).write.mode("overwrite").parquet(frag) // 64 tiny files
    Formats.compactParquet(spark, frag, compacted, targetMB = 128,
      sortCols = Seq("l_orderkey", "l_linenumber"))
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 64)
    assert(parquetFiles(compacted) <= 4, s"expected few files, got ${parquetFiles(compacted)}")
    val a = spark.read.parquet(frag).orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString)
    val b = spark.read.parquet(compacted).orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("writeZordered: parquet footers tight on BOTH dims, equal to the zonemap; day-sorted is not") {
    import org.apache.spark.sql.functions.col

    // per-file min/max of (x, y) from the ACTUAL parquet footers —
    // the statistics a scan's file/row-group skipping reads (the
    // same product helper readZorderedPruned builds its file list from)
    def fileStats(d: String): Seq[(String, Long, Long, Long, Long)] =
      Formats.parquetLongStats(spark, d, Seq("x", "y")).map { case (f, mm) =>
        val (x0, x1) = mm("x").get
        val (y0, y1) = mm("y").get
        (f, x0, x1, y0, y1)
      }

    // the synthetic events sit on ONE day with a ~15-user range (a
    // single z-cell — no layout to show); build a 4×4 user/day grid by
    // independent shifts so the corpus spans 16 cells and the two
    // layouts can actually disagree
    val base = Tables.events(spark, dir)
    val events = (for (i <- 0 until 4; j <- 0 until 4) yield
      base.withColumn("user_id", col("user_id") + org.apache.spark.sql.functions.lit(i * 300L))
        .withColumn("ts", col("ts") + org.apache.spark.sql.functions.expr(s"INTERVAL ${j * 300} DAYS")))
      .reduce(_ unionByName _)
    val zdir = Files.createTempDirectory("graft-zorder").toString + "/t"
    Formats.writeZordered(events, zdir)
    val zstats = fileStats(zdir)
    assert(zstats.nonEmpty)
    // a z-cell fixes the high 8 bits of each dimension: every file's
    // footer span must be ≤ 255 on user AND day at once
    zstats.foreach { case (f, x0, x1, y0, y1) =>
      assert(x1 - x0 <= 255, s"user span loose in $f")
      assert(y1 - y0 <= 255, s"day span loose in $f")
    }
    // the written footers ARE the zonemap: per cell, the union of its
    // files' footer stats equals the q_zorder_zonemap row exactly
    val zone = graft.ops.EventOps.zorderZonemap(events).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val cellOf = "zcell=([0-9]+)".r
    val byCell = zstats.groupBy { case (f, _, _, _, _) =>
      cellOf.findFirstMatchIn(f).get.group(1).toLong }
    assert(byCell.keySet == zone.keySet)
    for ((cell, fs) <- byCell) {
      val (mu, xu, md, xd) = zone(cell)
      assert(fs.map(_._2).min == mu && fs.map(_._3).max == xu, s"cell $cell user")
      assert(fs.map(_._4).min == md && fs.map(_._5).max == xd, s"cell $cell day")
    }
    // contrast: same data, same file count, sorted by day only — day
    // stays tight but user spans blow out to ~the full range
    val ddir = Files.createTempDirectory("graft-daysort").toString + "/t"
    graft.ops.EventOps.zKeyed(events)
      .repartitionByRange(math.max(1, zstats.size), col("y"))
      .sortWithinPartitions("y")
      .write.mode("overwrite").parquet(ddir)
    val dstats = fileStats(ddir)
    val fullUserSpan =
      zone.values.map(_._2).max - zone.values.map(_._1).min
    val avgZ = zstats.map(s => s._3 - s._2).sum.toDouble / zstats.size
    val avgD = dstats.map(s => s._3 - s._2).sum.toDouble / dstats.size
    assert(avgD > fullUserSpan * 0.5,
      s"day-sorted user spans unexpectedly tight: $avgD vs full $fullUserSpan")
    assert(avgZ <= 255.0 && avgZ < avgD / 2,
      s"z-order user spans not tighter: $avgZ vs day-sorted $avgD")

    // the READ side: a one-cell box predicate consults the footers and
    // opens a fraction of the z-layout's files, while the day-sorted
    // layout can only skip on day — user stats span everything
    val box = ((0L, 20L), (0L, 20L))
    val (zHit, zRead, zTotal) =
      Formats.readZorderedPruned(spark, zdir, box._1, box._2)
    val expected = graft.ops.EventOps.zKeyed(events)
      .filter(col("x").between(0, 20) && col("y").between(0, 20)).count()
    assert(zHit.count() == expected, "pruned read must not lose rows")
    assert(zRead < zTotal / 2,
      s"z-layout box read $zRead of $zTotal files — no skipping happened")
    val (dHit, dRead, dTotal) =
      Formats.readZorderedPruned(spark, ddir, box._1, box._2)
    assert(dHit.count() == expected)
    assert(zRead < dRead,
      s"z-layout ($zRead/$zTotal) must out-skip day-sorted ($dRead/$dTotal) on a 2-dim box")
  }

  test("parquetLongStats: missing column or non-INT64 reads as None (never a crash, never a false prune)") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft-stats").toString + "/t"
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    val stats = Formats.parquetLongStats(spark, d, Seq("l_orderkey", "x", "l_returnflag"))
    assert(stats.nonEmpty)
    stats.foreach { case (_, mm) =>
      assert(mm("l_orderkey").isDefined, "INT64 stats must be read")
      assert(mm("x").isEmpty, "absent column must read as unknown")
      assert(mm("l_returnflag").isEmpty, "non-INT64 column must read as unknown")
    }
  }

  test("stats/pruned-read fail loud on bad paths: missing dir throws, parquet-free dir refuses") {
    // a misspelled path must never price as "zero files" — the r9
    // ADVICE finding was exactly this silent-empty conversion
    val missing = "/tmp/graft-definitely-not-a-dir-12345"
    intercept[IllegalArgumentException] {
      Formats.parquetLongStats(spark, missing, Seq("x"))
    }
    intercept[Exception] { // listing layer throws before pruning logic
      Formats.readZorderedPruned(spark, missing, (0L, 1L), (0L, 1L))
    }
    val empty = Files.createTempDirectory("graft-empty").toString
    assert(Formats.parquetLongStats(spark, empty, Seq("x")).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Formats.readZorderedPruned(spark, empty, (0L, 1L), (0L, 1L))
    }
    assert(e.getMessage.contains("no parquet files"))
  }

  test("CSV round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("csv", Formats.writeCsv, (p, s) => Formats.readCsv(spark, p, s))
  }

  test("JSON round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("json", Formats.writeJson, (p, s) => Formats.readJson(spark, p, s))
  }

  test("schema evolution: mergeSchema unions parquet batches with added columns") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val v2 = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag") // column added later
    v1.write.parquet(s"$base/batch=1")
    v2.write.parquet(s"$base/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("l_orderkey", "l_quantity", "l_returnflag", "batch"))
    // old rows surface the new column as null; no rows lost
    assert(merged.count() == v1.count() + v2.count())
    assert(merged.filter(col("batch") === 1 && col("l_returnflag").isNotNull).count() == 0)
  }

  test("ORC round-trip preserves schema and values (incl. timestamps)") {
    roundtrips("orc", Formats.writeOrc, (p, s) => Formats.readOrc(spark, p, s))
  }

  test("ORC scan gets pushdown: filter reaches the reader as a search argument") {
    val src = Tables.lineitem(spark, dir)
    val tmp = Files.createTempDirectory("graft-orc-pushdown").toString + "/t"
    Formats.writeOrc(src, tmp)
    val plan = Formats.readOrc(spark, tmp, src.schema)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === 1L)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"), plan)
  }
}
