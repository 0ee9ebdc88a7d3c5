package graft

import org.apache.spark.sql.functions._

/** Dev tool: times the graft transform path (gzip CSV → quality filter →
  * timestamp cast → gzip parquet) against the reference's pandas chunk-loop
  * model on the same file, with and without a pinned schema. Usage:
  *   sbt "runMain graft.PipeBench /tmp/taxi_big.csv.gz /tmp/taxi_graft"
  */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    val spark = GraftSession.builder("graft-pipebench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count() // warm the session

    def run(label: String, src: sources.CsvSource, dest: String,
        repartitionTo: Option[Int] = None): Unit = {
      val t0 = System.nanoTime()
      val cleaned = pipeline.TaxiPipeline.castTimestampsIfPresent(
        pipeline.TaxiPipeline.dropZeroPassengers(src.read(spark)))
      val shaped = repartitionTo.map(cleaned.repartition).getOrElse(cleaned)
      sources.ParquetSink(dest).write(shaped)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label: $dt%.1f s, rows out ${spark.read.parquet(dest).count()}")
    }

    run("graft (inferSchema, 2 passes)", sources.CsvSource(in), s"${out}_infer")
    // production shape: schema pinned once (here discovered from the file's
    // own inference pass, then reused — steady-state ingest never re-infers)
    val schema = sources.CsvSource(in).read(spark).schema
    run("graft (pinned schema)", sources.CsvSource(in, schema = Some(schema)),
      s"${out}_pinned")
    // non-splittable gzip forces a serial scan, but the cast + parquet
    // encode + deflate can still fan out across cores
    run("graft (pinned + parallel write)",
      sources.CsvSource(in, schema = Some(schema)), s"${out}_par",
      repartitionTo = Some(8))
    spark.stop()
  }
}
