package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal) join — an operator Spark lacks natively, composed from
  * built-ins per the preference order in SURVEY.md §7.3(a): interleave both
  * sides in one stream, then a running `last(..., ignoreNulls)` window
  * carries the most recent right-side row forward onto each left row.
  *
  * Scale shape: ONE hash partition on the join key + one per-partition sort
  * by (ts, side) — identical cost to a sort-merge join, with none of the
  * range-explosion a naive `l.ts >= r.ts` theta-join would produce. This is
  * the standard streaming-style formulation; DuckDB's native ASOF JOIN
  * serves as the oracle.
  */
object AsOfJoinOps {

  /** Generic as-of join: for each left row, the latest right row with
    * `right.tsCol <= left.tsCol` within the same `keyCol`. The right side
    * must be unique per (key, ts) — pre-aggregate it if not. `valueCol` is
    * the right-side column carried onto left rows (null when no match).
    * The value rides inside a non-null struct wrapper, so a matched right
    * row whose value IS null propagates as null instead of being skipped by
    * `ignoreNulls` in favor of an older row (DuckDB ASOF JOIN semantics). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    val rvalType = right.schema(valueCol).dataType
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rrec",
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", rvalType)))))
    val r = right.select(col(keyCol), col(tsCol),
        struct(col(valueCol).as("v")).as("_rrec"))
      .withColumn("_side", lit(0))
    val extraLeftCols = left.columns.filterNot(Set(keyCol, tsCol))
    val rPadded = extraLeftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.toIndexedSeq.map(col): _*)

    // right rows sort before left rows at equal ts (<= semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.select(l.columns.toIndexedSeq.map(col): _*).union(rPadded)
      .withColumn("_matched",
        last(col("_rrec"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("_side") === 1)
      .drop("_side", "_rrec")
      .withColumnRenamed("_matched", valueCol)
  }

  /** Declared query: for every 'view' event, the most recent prior (or
    * simultaneous) 'purchase' by the same user. Right side deduped to
    * max(event_id) per (user, ts) so ties are deterministic. */
  def eventsAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    asOfJoin(views, purchases, "user_id", "ts", "purchase_id")
      .select(col("view_id"), col("user_id"), col("purchase_id"))
      .orderBy(col("view_id"))
  }
}
