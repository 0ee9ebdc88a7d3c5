package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.operators.PqOps

/** Streaming vector ingestion with online ANN tagging — the
  * train-offline / score-in-stream split ([[CorpusStreamOps]]'s unigram
  * pattern, applied to the ANN family): the IVF+PQ index is built ONCE
  * from the offline corpus at stream start (both models are bounded
  * driver state; the coded corpus a [[graft.operators.Materialize]]d
  * DataFrame), then every arriving micro-batch of (vec_id, embedding)
  * rows is tagged with its top-`k` corpus neighbors through the
  * IDENTICAL search kernel the batch queries use
  * ([[PqOps.IvfPqIndex.search]] — the round-11 probes-as-data plan, so
  * a micro-batch of any size is one job, never per-probe branches).
  *
  * Parity is structural, not asserted-by-similarity: per-query results
  * are probe-batch-invariant (PqSpec pins it), so the union of
  * per-micro-batch tags over a partitioned corpus equals the one-shot
  * batch kNN graph — StreamGate check `ann_tag_stream_vs_knn_graph`
  * records exactly that each round.
  *
  * The tag sink is EXACTLY-ONCE under replays (round 12, reusing the
  * proven epoch-partition recipe from
  * [[CorpusStreamOps.startBandIndexStream]]): each micro-batch's tags
  * land under their `epoch=<batch id>` partition with dynamic partition
  * overwrite, so a batch replayed after a crash replaces precisely its
  * own partition instead of appending bitwise-duplicate rows —
  * idempotence lives in the table layout, visible to any plain parquet
  * reader, not in a downstream dedup obligation (StreamGate's
  * `ann_tag_replay_exactly_once` check forces a replay and diffs).
  *
  * `excludeSelfId` (default true) assumes stream probe ids share the
  * corpus vec_id namespace (the StreamGate parity setup streams the
  * corpus's own vectors). A deployment whose probe ids are an UNRELATED
  * namespace must pass false — otherwise an incoming id that happens to
  * collide with a corpus vec_id silently loses that corpus vector as a
  * legitimate neighbor (see [[PqOps.IvfPqIndex.search]]). */
object VectorStreamOps {

  def startAnnTagStream(spark: SparkSession, inputDir: String,
      schema: StructType, corpusDir: String, outDir: String,
      checkpointDir: String, k: Int = 3, shortlist: Int = 20,
      nprobe: Int = 4, excludeSelfId: Boolean = true): StreamingQuery = {
    val index = PqOps.buildIndex(spark, corpusDir)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val tagged = index.search(batch.select("vec_id", "embedding"),
            k = k, shortlist = shortlist, nprobe = nprobe,
            excludeSelfId = excludeSelfId)
          .withColumn("epoch", org.apache.spark.sql.functions.lit(epochId))
        // the overwrite-mode conf must be set on the session that RUNS
        // the write — `tagged` descends from the index's corpus frames,
        // so that is the index-building session, NOT the micro-batch
        // clone `batch.sparkSession` (setting it there silently left
        // static overwrite semantics: each epoch wiped all previous ones)
        val sp = tagged.sparkSession
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = sp.conf.get(key, "static")
        sp.conf.set(key, "dynamic")
        try tagged.write.mode("overwrite").partitionBy("epoch")
          .parquet(outDir)
        finally sp.conf.set(key, prev)
      }
      .start()
  }
}
