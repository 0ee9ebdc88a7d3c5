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

  /** Train a BOUNDED unigram quality model on a batch corpus: the `topK`
    * most frequent tokens with their corpus log10 probability, plus an OOV
    * floor (the log-prob of a once-seen token). Bounded so the model can be
    * broadcast into a streaming scorer — the standard train-offline /
    * score-in-stream split; the full-corpus batch twin is
    * [[graft.operators.TextOps.unigramLogprob]]. */
  def trainUnigramModel(docs: DataFrame, topK: Int = 65536)
      : (Map[String, Double], Double) = {
    val counts = docs
      .select(explode(TextFunctions.tokensLower(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n"))).head().getLong(0).toDouble
    val top = counts.orderBy(col("n").desc, col("token")).limit(topK)
      .collect().map(r => r.getString(0) -> math.log10(r.getLong(1) / total))
      .toMap
    (top, math.log10(1.0 / total))
  }

  /** Score documents under a bounded unigram model as a NARROW map — no
    * explode, no aggregation, no join, so it runs identically on a batch
    * frame and inside a streaming micro-batch (append mode needs no state).
    * The model rides the closure like [[graft.operators.IvfOps]]'s
    * centroids: bounded driver-held state broadcast to executors. */
  def scoreWithModel(docs: DataFrame, model: Map[String, Double],
      oovLogp: Double): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val score = udf { toks: Seq[String] =>
      if (toks.isEmpty) None
      else Some(toks.map(t => model.getOrElse(t, oovLogp)).sum / toks.size)
    }
    docs
      .withColumn("mean_logp",
        stableRound4(score(TextFunctions.tokensLower(col("text")))))
      .filter(col("mean_logp").isNotNull)
      .withColumn("low_quality", col("mean_logp") < -3.5)
  }

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
