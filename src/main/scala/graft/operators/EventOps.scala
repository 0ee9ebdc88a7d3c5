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
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("hr"), col("event_type"))

  /** JSON payload extraction (`props` is a JSON object per event). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        col("event_type"))
      .orderBy(col("event_id"))
}
