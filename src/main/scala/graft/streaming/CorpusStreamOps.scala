package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.functions.TextFunctions

/** Streaming twin of the corpus-cleaning path (TextOps/CorpusOps ★): new
  * document files land continuously, and each micro-batch is fingerprinted,
  * quality-gated, and exact-deduped — INCLUDING against every earlier batch,
  * which the batch pipeline can only do by full re-runs. The dedup state is
  * Spark's streaming aggregation state keyed by fingerprint.
  *
  * State note: `dropDuplicates` on a stream without a watermark keeps one
  * state row per distinct fingerprint forever — that IS the semantics of
  * global exact dedup (the key set is the state, a few dozen bytes per
  * distinct doc, mergeable and checkpointed). A deployment that only needs
  * near-horizon dedup adds an event-time column + watermark to bound it;
  * the transform is a plain DataFrame function so both variants share it.
  */
object CorpusStreamOps {

  /** Batch/stream-shared cleaning transform: fingerprint, length gate,
    * first-seen-wins exact dedup on the fingerprint. */
  def clean(docs: DataFrame, minTokens: Int = 5): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("n_tokens", size(TextFunctions.tokens(col("text"))))
      .filter(col("n_tokens") >= minTokens)
      .dropDuplicates("fp")

  /** File-source stream of document parquet → [[clean]] → append parquet
    * sink, one micro-batch per arriving file (the chunked-ingest loop with
    * cross-batch dedup state). */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      outDir: String, checkpointDir: String): StreamingQuery =
    clean(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inputDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
