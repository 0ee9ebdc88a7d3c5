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
    // The events table's `ts` has varied across testdata generations:
    // TIMESTAMP(NANOS) (readable only as raw long nanos via
    // spark.sql.legacy.parquet.nanosAsLong, set by Verify/Bench/tests) or
    // plain timestamp[us] without timezone (read as TIMESTAMP_NTZ).
    // Normalize both to TimestampType so every downstream operator sees the
    // same type; sessions pin spark.sql.session.timeZone=UTC, so the NTZ
    // cast is value-preserving and matches the DuckDB oracle's naive read.
    val nanosFixed =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    // Belt-and-braces: sessions set spark.sql.parquet.inferTimestampNTZ
    // .enabled=false so naive parquet timestamps scan directly as
    // TimestampType (keeps filter pushdown). If a caller-built session
    // misses that config, normalize here; the cast is value-preserving
    // because every session pins spark.sql.session.timeZone=UTC.
    nanosFixed.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
      .foldLeft(nanosFixed) { (acc, f) =>
        acc.withColumn(f.name, expr(s"cast(${f.name} as timestamp)"))
      }
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
