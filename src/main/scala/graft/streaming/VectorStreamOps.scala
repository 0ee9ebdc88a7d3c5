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
  * The verdict sink is plain append parquet (at-least-once on replay,
  * dedupable by q_id — tags are deterministic, so re-emitted rows are
  * bitwise duplicates; there is no index mutation here, hence no epoch
  * fence needed, unlike [[CorpusStreamOps.startBandIndexStream]]). */
object VectorStreamOps {

  def startAnnTagStream(spark: SparkSession, inputDir: String,
      schema: StructType, corpusDir: String, outDir: String,
      checkpointDir: String, k: Int = 3, shortlist: Int = 20,
      nprobe: Int = 4): StreamingQuery = {
    val index = PqOps.buildIndex(spark, corpusDir)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        index.search(batch.select("vec_id", "embedding"),
            k = k, shortlist = shortlist, nprobe = nprobe)
          .write.mode("append").parquet(outDir)
      }
      .start()
  }
}
