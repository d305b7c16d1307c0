package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-preserving readers/writers for the interchange formats a
  * pipeline meets besides parquet. Parquet stays the canonical store
  * (columnar, statistics, pushdown); CSV/JSON are edges.
  *
  * Round-trip rules that make these safe (asserted in FormatsSpec):
  * always pass the schema on read (inference is a full extra scan and
  * drifts types), ISO-8601 timestamps, explicit null handling for CSV.
  */
object Formats {

  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  // TIMESTAMP_NTZ columns (e.g. parquet-sourced shipdates) are governed
  // by timestampNTZFormat — timestampFormat is silently ignored for them
  private val tsNtzFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsNtzFmt)
      .option("nullValue", "\\N")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsNtzFmt)
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsNtzFmt)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsNtzFmt)
      .schema(schema)
      .json(path)

  /** ORC round-trip: the other self-describing columnar format Spark
    * ships a vectorized reader for (predicate pushdown and column
    * pruning work like parquet's). Useful when a neighboring system
    * exchanges ORC; parquet remains the canonical store.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Compact a parquet directory to ~targetMB output files, optionally
    * sorting within files by the given columns (sorted files give
    * parquet min/max row-group statistics real selectivity, so later
    * point/range scans skip row groups).
    *
    * The small-files problem is the silent killer of long-running
    * ingestion at scale: a stream or per-batch job writing a file per
    * partition per trigger turns a table into millions of kilobyte
    * files, and every downstream scan pays per-file open cost. Periodic
    * compaction like this is the standard maintenance pass.
    */
  /** Write events Z-ORDERED: each row keyed by the Morton interleave
    * of (user_id, event day) ([[graft.ops.EventOps.zKeyed]]), files
    * partitioned by z-cell and sorted by z within a file — the step
    * that turns q_zorder_zonemap's layout TABLE into actual storage
    * layout. Because a cell fixes the high 8 bits of BOTH dimensions,
    * every written file's parquet min/max statistics are tight
    * (spans ≤ 255) on user AND day at once, so range predicates on
    * either dimension skip files/row-groups — a single-column sort
    * gives that for one dimension and destroys it for the other
    * (FormatsSpec reads the actual parquet footers for both layouts
    * and measures exactly that contrast).
    *
    * Shuffle shape: one exchange on zcell (the same key the zonemap
    * aggregate needs anyway); within a task rows sort by full z so
    * row groups inside a file stay tight too. At 100 TB the writer
    * runs per ingest partition (e.g. per day batch) and cells keep
    * file sizes bounded because each covers ≤ 256×256 key space.
    */
  def writeZordered(events: DataFrame, outDir: String): Unit =
    graft.ops.EventOps.zKeyed(events)
      .repartition(org.apache.spark.sql.functions.col("zcell"))
      .sortWithinPartitions("zcell", "z")
      .write.mode("overwrite")
      .partitionBy("zcell")
      .parquet(outDir)

  /** Merge a z-ordered ingest history (per-batch `ingest_batch=<id>`
    * directories, each partitioned by zcell — the
    * [[graft.streaming.EventStream.zorderOnIngest]] layout) into one
    * clean per-cell layout: all batches' rows for a cell land in the
    * same files, sorted by z. This is the periodic maintenance pass
    * that keeps the small-files problem from eating the layout's
    * skipping value — per-batch writes keep ingest latency low, the
    * compactor restores scan efficiency, and because every batch used
    * the same fixed origin the merge is a pure repartition, never a
    * re-keying.
    */
  def compactZordered(spark: SparkSession, inDir: String,
      outDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(inDir)
      .drop("ingest_batch")
      .repartition(col("zcell"))
      .sortWithinPartitions("zcell", "z")
      .write.mode("overwrite").partitionBy("zcell").parquet(outDir)
  }

  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetMB: Int = 128, sortCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1,
      (bytes / (targetMB.toLong * 1024 * 1024)).toLong).toInt
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else df.repartition(nFiles)
    out.write.mode("overwrite").parquet(outDir)
  }
}
