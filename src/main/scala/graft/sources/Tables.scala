package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Typed loaders for the test star schema + pipeline tables.
  *
  * All loads are plain columnar parquet scans so Catalyst's predicate
  * pushdown and column pruning apply end-to-end; no caching or collect
  * here — at 100 TB these are streamed scans.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events stream table, normalized so `ts` is always µs TimestampType.
    *
    * The generator has shipped two on-disk forms: TIMESTAMP(NANOS) (read
    * as Long under `spark.sql.legacy.parquet.nanosAsLong`, floor-converted
    * to µs — matching DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncation) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ; the
    * session is pinned to UTC, so the cast below is identity on the micros
    * value). Downstream code — `unix_micros`, watermarks, window() — wants
    * TimestampType; outputs cast back to timestamp_ntz at the edge.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
}
