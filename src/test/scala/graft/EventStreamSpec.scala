package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.streaming.EventStream

/** The streaming twins must reproduce the oracle-checked batch results
  * when the events parquet is replayed as a stream.
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourlyCounts == batch q_event_windows") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toString).sorted
    val batch = EventOps.queries("q_event_windows")(spark, dir)
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup: replaying the same file twice emits each event_id once") {
    // two globs over the same file = the same events delivered twice
    import org.apache.spark.sql.functions.col
    val once = EventStream.readEvents(spark, dir)
    val twice = EventStream.dedupEvents(once.union(once))
    val q = twice.writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("deduped").count()
    val distinct = spark.table("deduped").select(col("event_id")).distinct().count()
    val batchN = graft.core.Tables.events(spark, dir).count()
    assert(n == distinct)
    assert(n == batchN)
  }

  test("stream-static enrichment == the same join run in batch") {
    val customers = graft.core.Tables.customer(spark, dir)
    val q = EventStream.enrich(EventStream.readEvents(spark, dir), customers)
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("enriched").collect().map(_.toString).sorted
    val batch = EventStream.enrich(
        graft.core.Tables.events(spark, dir).select(
          col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props")),
        customers)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("stream-stream view->purchase join == the same join run in batch") {
    val q = EventStream.viewToPurchase(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("attributed").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("attributed").collect().map(_.toString).sorted
    val batchEvents = graft.core.Tables.events(spark, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"), col("props"))
    val batch = EventStream.viewToPurchase(batchEvents)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("streaming session_window: every emitted session is a batch session") {
    // native session_window under a watermark emits a session only once
    // the watermark passes its close; with one replayed file the tail
    // sessions stay open, so the streamed set is a prefix of batch
    val q = graft.ops.EventOps.sessionizeNative(
        EventStream.readEvents(spark, dir).withWatermark("ts", "1 hour"))
      .writeStream.outputMode("append")
      .format("memory").queryName("native_sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("native_sessions")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).toSet
    val batch = graft.ops.EventOps.sessionizeNative(
        graft.core.Tables.events(spark, dir))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed-only sessions: ${streamed -- batch}")
  }

  test("streaming sessionize == batch q_sessionize minus each user's open tail session") {
    val q = EventStream.sessionize(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(_.toString).sorted

    // batch sessions, dropping the last session per user (still open in
    // the streaming state, would flush on timeout)
    val batch = EventOps.queries("q_sessionize")(spark, dir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val expected = batch
      .withColumn("max_sid", max(col("session_id")).over(w))
      .filter(col("session_id") < col("max_sid"))
      .select(col("user_id"), unix_micros(col("session_start")).as("session_start"),
        col("n_events"))
      .collect().map(_.toString).sorted

    assert(streamed.nonEmpty)
    assert(streamed.sameElements(expected))
  }

  test("streaming scd2 == batch q_scd2's closed versions on replay") {
    val q = EventStream.scd2Stream(EventStream.readEvents(spark, dir), "purchase")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_stream")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("scd2_stream")
      .select("user_id", "version", "value", "valid_from", "valid_to")
      .collect().map(_.toString).sorted

    // the open (current) version per user lives in streaming state —
    // the batch twin's valid_to IS NULL rows
    val expected = EventOps.scd2(graft.core.Tables.events(spark, dir), "purchase")
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("version"), col("value"),
        unix_micros(col("valid_from")).as("valid_from"),
        unix_micros(col("valid_to")).as("valid_to"))
      .collect().map(_.toString).sorted

    assert(streamed.nonEmpty)
    assert(streamed.sameElements(expected))
  }

  test("late data beyond the watermark is dropped AND the drop is observable") {
    // the ops contract of event-time processing: a row arriving after
    // the watermark has passed its window must not corrupt emitted
    // aggregates, and the drop must surface in metrics (the thing an
    // on-call reads when counts look low) — not vanish silently
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val df = ms.toDF().toDF("epoch", "event_type", "value")
      .select(to_timestamp(from_unixtime(col("epoch"))).as("ts"),
        col("event_type"), col("value"))
    val q = EventStream.hourlyCounts(df)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_drop")
      .start()
    try {
      // batch 1: fresh event at t = 400 h → watermark advances to 399 h
      ms.addData((400L * 3600L, "view", 1.0))
      q.processAllAvailable()
      // batch 2: a straggler from t = 2 h — hundreds of hours late
      ms.addData((2L * 3600L, "view", 1.0))
      q.processAllAvailable()
      // batch 3: advance the watermark past the fresh window so the
      // legitimate aggregate emits
      ms.addData((500L * 3600L, "view", 1.0))
      q.processAllAvailable()
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, "late row was not counted as dropped")
    } finally q.stop()
    // the late row's window never reached the output
    val hours = spark.table("late_drop").collect()
      .map(r => r.getTimestamp(0).toInstant.getEpochSecond / 3600L)
    assert(hours.contains(400L), s"fresh window missing: ${hours.mkString(",")}")
    assert(!hours.contains(2L), s"late window leaked: ${hours.mkString(",")}")
  }

  test("a single hot key (100k events, one user) keeps state bounded and the batch moving") {
    // the streaming sibling of the salted-batch skew path: state is
    // keyed by user, so a hot user must cost O(1) STATE (one
    // SessionState) no matter how many events it floods in — the
    // skew lands on one task's in-batch sort, never in the store.
    // 100k events for user 0 (alternating inside/outside the session
    // gap, so sessions actually close and emit) + 50 normal users.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = EventStream.gapMicros
    val hot = (0 until 100000).map { i =>
      // every event lands gap+1s after the previous one, so each closes
      // the prior singleton session — maximal emission pressure
      EventStream.Ev(i.toLong, i.toLong * (gap + 1000000L), 0L, 1.0)
    }
    val normal = for (u <- 1L to 50L; i <- 0 until 10)
      yield EventStream.Ev(1000000L + u * 100 + i, i.toLong * 1000000L, u, 1.0)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev]
    ms.addData(hot ++ normal)
    val q = ms.toDF()
      .select(col("event_id"), timestamp_micros(col("tsMicros")).as("ts"),
        col("user_id"), col("value"))
      .transform(EventStream.sessionize(_).toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("hotkey_sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    // bounded state: one row per DISTINCT user — 51 — not per event
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 51L, s"state rows $stateRows != 51 distinct keys")
    // the hot user's sessions all emitted (every event > gap from the
    // previous closes a session; the final one stays open in state)
    val hotSessions = spark.table("hotkey_sessions")
      .filter(col("user_id") === 0L).count()
    assert(hotSessions == 99999L, s"hot-user sessions $hotSessions")
  }

  test("zorderOnIngest + compactZordered: cells stay aligned across batches, per-file spans tight") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dayMicros = 86400000000L
    // 4×4 (user-block, day-block) grid, 5 events per cell; the second
    // batch shifts by 7 WITHIN each 256-block so both batches must
    // land in the same 16 cells — only a fixed-origin grid does that
    def evs(seed: Int) = (for (u <- 0 until 4; d <- 0 until 4; i <- 0 until 5)
      yield EventStream.Ev((seed * 10000 + u * 1000 + d * 100 + i).toLong,
        (d * 300L + seed) * dayMicros + i * 1000000L, u * 300L + seed, 1.0)).toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev]
    val out = java.nio.file.Files.createTempDirectory("graft-zingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-zingest-ck").toString
    val q = EventStream.zorderOnIngest(
      ms.toDF().select(col("event_id"),
        timestamp_micros(col("tsMicros")).as("ts"), col("user_id"), col("value")),
      out, ckpt, originUser = 0L, originDay = 0L)
    try {
      ms.addData(evs(0)); q.processAllAvailable()
      ms.addData(evs(7)); q.processAllAvailable()
    } finally q.stop()
    val raw = spark.read.parquet(out)
    assert(raw.count() == 160L)
    assert(raw.filter(col("zcell") =!= shiftright(col("z"), 16)).count() == 0L)
    // both batches hit the SAME 16 cells — the fixed-origin guarantee
    assert(raw.select("zcell").distinct().count() == 16L)
    val compact = java.nio.file.Files.createTempDirectory("graft-zcompact").toString
    graft.sources.Formats.compactZordered(spark, out, compact)
    val c = spark.read.parquet(compact)
    assert(c.count() == 160L)
    val spans = c.groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    spans.foreach { r =>
      assert(r.getLong(1) <= 255L && r.getLong(2) <= 255L, r.toString)
    }
    // compaction merged the two batch copies of each cell: one file
    // per occupied cell, not one per (batch, cell)
    assert(spans.length.toLong == c.select("zcell").distinct().count())
  }
}
