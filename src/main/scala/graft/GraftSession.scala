package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + SQL surface for the graft engine.
  *
  * [[builder]] encodes the 100 TB posture as configuration: AQE on (runtime
  * shuffle coalescing, dynamic broadcast selection, skew-join splitting),
  * UTC semantics, and shuffle parallelism sized to the cluster instead of
  * Spark's legacy 200. On a real cluster only `master` and the partition
  * count change; every operator in this library is written against plain
  * `SparkSession`, so nothing else is environment-specific.
  */
object GraftSession {

  def builder(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      // custom planner strategies (TopKPerGroup) registered the
      // deployment-grade way; see graft.plans.GraftExtensions
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  /** Register every test table as a temp view so the whole engine surface is
    * additionally reachable through `spark.sql(...)` — Catalyst plans SQL
    * and DataFrame identically. */
  def openTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
