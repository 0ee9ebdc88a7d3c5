package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based approximate aggregation — the one-pass, merge-commutative
  * alternatives the 100 TB path substitutes for exact operators:
  * HyperLogLog++ (approx_count_distinct) for COUNT(DISTINCT), t-digest-style
  * approx_percentile for exact interpolated percentiles. Deterministic for
  * fixed data (sketch merges are commutative), but engine-specific, so the
  * declared query takes the rows-only check; ScalaTest bounds the error
  * against the exact aggregates.
  */
object SketchOps {

  /** Per-flag approximate distinct parts/suppliers + approximate median
    * price, next to the exact row count. */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("apx_parts"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("apx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("apx_median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
}
