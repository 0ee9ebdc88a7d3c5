package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-table operators: event-time windowed aggregation and JSON payload
  * extraction — the batch faces of the streaming surface (the same
  * aggregations run under Structured Streaming in graft.streaming).
  */
object EventOps {

  /** Hourly event-time rollup per event type (tumbling-window shape;
    * `date_trunc` keeps it SQL-expressible — the streaming variant uses
    * `window($"ts", "1 hour")` with a watermark). */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hr"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        // averages of low-decimal data land on exact 4th-decimal halves —
        // stabilized rounding (see NumericFunctions) keeps engines agreeing
        graft.functions.NumericFunctions.stableRound4(avg(col("value")))
          .as("avg_value"))
      .orderBy(col("hr"), col("event_type"))

  /** Gap-based sessionization, batch/window formulation: a session breaks
    * after 30 idle minutes; session id = running count of breaks. Same
    * semantics as the streaming `flatMapGroupsWithState` operator in
    * graft.streaming — this declarative version is SQL-expressible, so the
    * oracle can replay it. One hash partition on user_id + one sort. */
  def sessionAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** JSON payload extraction (`props` is a JSON object per event). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        col("event_type"))
      .orderBy(col("event_id"))
}
