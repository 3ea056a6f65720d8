package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the engine's sources.
  *
  * Mirrors the reference's load surface (Postgres COPY of a pipe-delimited
  * CSV with header and empty-string nulls — /root/reference/dags/ELT.py:92-98)
  * plus the parquet test tables.
  */
object Ingest {

  /** Parquet table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events table with its TIMESTAMP(NANOS) column normalized.
    *
    * With `spark.sql.legacy.parquet.nanosAsLong=true` the ts column arrives
    * as int64 nanos; we derive `ts_ms` (epoch millis, the cross-engine-safe
    * representation — DuckDB's `epoch_ms(ts)` truncates identically) and
    * rebuild `ts` as a millisecond-precision TimestampType. Integer `div`
    * (not `/`) — nanos exceed 2^53 so double division would lose bits.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    val tsMs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000000")
      case _        => unix_millis(col("ts"))
    }
    raw
      .withColumn("ts_ms", tsMs)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  /** Pipe-delimited CSV with header and empty-string-as-NULL: the exact
    * semantics of the reference's `COPY ... (delimiter '|', format csv,
    * header, NULL '')` staging load (ELT.py:94-96), with an explicit typed
    * schema instead of Postgres DDL.
    */
  def csvPipe(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("delimiter", "|")
      .option("header", "true")
      .option("nullValue", "")
      .option("timestampFormat", "yyyy/MM/dd hh:mm:ss a")
      .schema(schema)
      .csv(path)

  /** JSON lines source. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet writer — the scale-out sink: partition column
    * choice drives partition pruning for downstream readers.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed (and bucket-sorted) parquet table writer: pre-shuffles on
    * the bucket key once at write time so every later equi-join or
    * aggregation on that key reads co-located buckets and skips its
    * shuffle — the standing answer to "this fact table is joined on
    * orderkey every day" at 100 TB. Bucketed tables require the
    * catalog, hence `saveAsTable`.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
}
