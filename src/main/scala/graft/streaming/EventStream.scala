package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming versions of the event analytics in
  * [[graft.ops.EventOps]]: watermarked tumbling-window aggregation and
  * stateful gap-based sessionization via flatMapGroupsWithState.
  *
  * The batch queries are the oracle-checked source of truth; these
  * produce the same rows when a parquet directory is replayed as a
  * stream (asserted in EventStreamSpec). State is keyed by user_id, so
  * the streaming job scales exactly like the batch one partitions.
  */
object EventStream {

  /** Stream the events table. FileStreamSource needs an explicit
    * schema, and the file's physical `ts` encoding varies by driver
    * data generation (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS) —
    * see [[graft.core.Tables.normalizeTs]]), so the schema comes from
    * a metadata-only batch read of the same files and the stream is
    * normalized through the shared path.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$sfDir/events.*").schema
    graft.core.Tables.normalizeTs(
      spark.readStream
        .schema(fileSchema)
        // glob, not a bare file path: FileStreamSource requires basePath
        // to be a directory, which the glob's parent satisfies
        .parquet(s"$sfDir/events.*"))
  }

  /** Tumbling 1-hour windows per event type with a 1-hour watermark —
    * the streaming twin of q_event_windows. The value sum goes through
    * exact DECIMAL like the batch query so micro-batch merge order
    * cannot perturb it (plain double summation would differ from the
    * batch result in low-order bits).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same event_id,
    * keeping 1 hour of id state — the streaming twin of the batch
    * md5-groupBy exact dedup. dropDuplicatesWithinWatermark (not plain
    * dropDuplicates, whose state never evicts unless the event-time
    * column is part of the key) lets the watermark bound the state
    * store, which is what makes this viable on an unbounded stream.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: every micro-batch joins the event stream
    * against a static dimension. The dimension is broadcast, so the
    * stream side never shuffles — the standard shape for decorating an
    * unbounded stream with slowly-changing reference data (at scale the
    * dim is re-broadcast per batch, so a refreshed snapshot is picked up
    * on the next trigger).
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))

  /** Stream-stream inner join: each view matched to the same user's
    * purchases within the following hour. Both sides are watermarked
    * and the join condition is time-bounded, which is what lets the
    * state store evict rows once the watermark passes the bound —
    * without the time range the state would grow forever. This is the
    * attribution-join shape (impression→conversion) of an event
    * pipeline.
    */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    views.join(buys,
      col("user_id") === col("b_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select("view_id", "user_id", "view_ts", "purchase_id", "purchase_ts")
  }

  case class Ev(event_id: Long, tsMicros: Long, user_id: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  val gapMicros: Long = 1800L * 1000000L

  case class Scd2State(version: Int, value: Double, validFromMicros: Long)
  case class Scd2Row(user_id: Long, version: Int, value: Double,
      valid_from: Long, valid_to: Long)

  /** Streaming SCD Type-2 maintenance — the live twin of
    * [[graft.ops.EventOps.scd2]]: each change event CLOSES the entity's
    * current version (emitted downstream with its final
    * [valid_from, valid_to) interval) and opens the next one in state.
    * Append-mode emission is exactly the CDC contract a warehouse sink
    * wants: closed versions are immutable facts, the open version lives
    * in the state store until its closing change arrives (a live
    * deployment would also flush it on timeout). State is one
    * (version, value, valid_from) triple per entity — O(entities),
    * keyed by user_id, so the stream scales exactly like the batch
    * window partitions. Spec-asserted equal to the batch build's
    * closed-version set on replay (EventStreamSpec).
    */
  def scd2Stream(events: DataFrame, changeType: String = "purchase"): Dataset[Scd2Row] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.filter(col("event_type") === changeType)
      .select(col("event_id"), unix_micros(col("ts")).as("tsMicros"),
        col("user_id"), col("value")).as[Ev]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[Scd2State]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[Scd2Row]
          sorted.foreach { e =>
            cur match {
              case Some(s) =>
                out += Scd2Row(userId, s.version, s.value, s.validFromMicros, e.tsMicros)
                cur = Some(Scd2State(s.version + 1, e.value, e.tsMicros))
              case None =>
                cur = Some(Scd2State(1, e.value, e.tsMicros))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Z-ordered ingest — the streaming end of the storage-layout tier:
    * each micro-batch writes its events Morton-keyed against a FIXED
    * (originUser, originDay) grid ([[graft.ops.EventOps.zKeyedFrom]]),
    * files partitioned by z-cell and z-sorted within, under the
    * batch's own `ingest_batch=<id>` directory (the writeCurated
    * idempotent-replay contract: a re-executed batch overwrites its
    * directory byte-identically instead of appending a second copy).
    * The fixed origin is what makes the layout a TABLE property
    * rather than a batch property — every batch's cells align, so
    * [[graft.sources.Formats.compactZordered]] merges the history
    * into one tight per-cell layout with a pure repartition, and
    * zonemap pruning holds across the entire ingest, not per batch.
    */
  def zorderOnIngest(events: DataFrame, outDir: String,
      checkpointDir: String, originUser: Long, originDay: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ops.EventOps.zKeyedFrom(batch, originUser, originDay)
          .repartition(col("zcell"))
          .sortWithinPartitions("zcell", "z")
          .write.mode("overwrite").partitionBy("zcell")
          .parquet(s"$outDir/ingest_batch=$id")
      }
      .start()

  /** Stateful sessionization: emits every session closed by a >30 min
    * gap; the still-open tail session per user remains in state (and
    * would be flushed by timeout in a live stream).
    */
  def sessionize(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col("event_id"), unix_micros(col("ts")).as("tsMicros"),
        col("user_id"), col("value")).as[Ev]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMicros - s.end <= gapMicros =>
                cur = Some(SessionState(s.start, e.tsMicros, s.n + 1, s.sum + e.value))
              case Some(s) =>
                out += Session(userId, s.start, s.end, s.n, s.sum)
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
