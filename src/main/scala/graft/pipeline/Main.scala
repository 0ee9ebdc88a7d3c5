package graft.pipeline

import graft.GraftSession

/** CLI entry point — the reference's `__main__`/argparse path (R18,
  * ingest_data.py:145-157) re-expressed. All parameters have the
  * deployment's defaults (main_flow-deployment.yaml:11-15); any can be
  * overridden as `--key value`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val base = opts.getOrElse("output_dir", ".sample_data")
    val c = TaxiPipeline.Config(
      outputDir = base,
      taxiColor = opts.getOrElse("taxi_color", "green"),
      year = opts.getOrElse("year", "2019").toInt,
      month = opts.getOrElse("month", "11").toInt,
      jdbcUrl = opts.getOrElse("jdbc_url", s"jdbc:derby:$base/db;create=true"),
      bucketDir = opts.getOrElse("bucket_dir", s"$base/bucket"),
      warehouseDir = opts.getOrElse("warehouse_dir", s"$base/warehouse"))
    val url = opts.getOrElse("url",
      "https://github.com/DataTalksClub/nyc-tlc-data/releases/download/" +
        s"${c.taxiColor}/${c.taxiColor}_tripdata_${c.year}-" +
        f"${c.month}%02d.csv.gz")
    val spark = GraftSession.builder(appName = "graft-taxi-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val back = TaxiPipeline.run(spark, url, c)
      println(s"pipeline complete: ${back.count()} rows exported to " +
        s"${c.bucketDir}/${TaxiPipeline.tableName(c)}.parquet")
    } finally spark.stop()
  }
}
