package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.pipeline.TaxiPipeline

/** Streaming version of the reference's chunked CSV ingest
  * (ingest_data.py:54-85): a file-source stream with `maxFilesPerTrigger=1`
  * IS the chunk loop — each arriving file is a micro-batch flowing through
  * the same transform chain (quality filter + conditional cast) into an
  * append parquet sink with exactly-once checkpointing, which the pandas
  * loop never had. New files in `inputDir` are picked up incrementally;
  * state is just the file log, so this runs forever at any scale.
  */
object StreamingIngest {

  def start(spark: SparkSession, inputDir: String, schema: StructType,
      outputDir: String, checkpointDir: String): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "1")
      .csv(inputDir)
    val cleaned = TaxiPipeline.castTimestampsIfPresent(
      TaxiPipeline.dropZeroPassengers(raw))
    cleaned.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
