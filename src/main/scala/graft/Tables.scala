package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * Each table is a single parquet file under `\$dir/<name>.parquet`. Reads are
  * lazy DataFrames, so Catalyst pushes filters/column pruning into the scan —
  * callers should never cache these eagerly; at 100 TB the scan must stay
  * prunable.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    // Spark only reads as raw long nanos (spark.sql.legacy.parquet.nanosAsLong
    // — set by Verify/Bench/tests). Normalize to a proper TimestampType
    // (microsecond precision) so every downstream operator sees a timestamp.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
