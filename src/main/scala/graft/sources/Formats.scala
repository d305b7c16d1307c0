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
}
