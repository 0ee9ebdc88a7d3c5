package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusStreamSpec extends SparkTestBase {

  test("streaming corpus clean dedups across micro-batches; equals the batch run") {
    val base = Files.createTempDirectory("graft-docs")
    val in = Files.createDirectories(base.resolve("in"))
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString

    val docs = graft.Tables.documents(spark, sf)
    val schema = docs.schema

    // land each batch as ONE parquet file with a name that fixes the intake
    // order (file source processes oldest-first)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmpDir = Files.createTempDirectory("graft-land")
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = Files.list(tmpDir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(name))
    }

    // batch 1: the corpus
    land(docs, "001.parquet")
    val q = CorpusStreamOps.start(spark, in.toString, schema, out, cp)
    q.processAllAvailable()
    // batch 2: 50 exact re-sends with shifted ids — cross-batch duplicates
    // only the streaming dedup state can catch
    land(docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L), "002.parquet")
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
    val batch = CorpusStreamOps.clean(
      docs.unionByName(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L)))
    // same distinct fingerprints, every re-sent duplicate suppressed
    assert(got.select(col("fp")).distinct().count() == got.count())
    assert(got.count() == batch.count())
    // the re-sent copies must all be dropped (their fp already seen)
    assert(got.filter(col("doc_id") >= 1000000L).count() == 0)
  }

  test("stream scoring with the batch-trained unigram model equals the batch run") {
    val docs = graft.Tables.documents(spark, sf)
    val (model, oov) = CorpusStreamOps.trainUnigramModel(docs)
    val batch = CorpusStreamOps.scoreWithModel(docs, model, oov)
      .select("doc_id", "mean_logp", "low_quality")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

    // stream the same corpus through a file source in two batches; the
    // scorer is a narrow map, so append mode needs no state or watermark
    val base = Files.createTempDirectory("graft-score")
    val in = Files.createDirectories(base.resolve("in"))
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmpDir = Files.createTempDirectory("graft-land2")
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = Files.list(tmpDir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(name))
    }
    land(docs.filter(col("doc_id") < 250), "001.parquet")
    land(docs.filter(col("doc_id") >= 250), "002.parquet")
    val q = CorpusStreamOps.scoreWithModel(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(in.toString),
        model, oov)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(out)
      .select("doc_id", "mean_logp", "low_quality")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(streamed == batch)
    // with topK = full vocab the bounded model matches the exact batch twin
    val exact = graft.operators.TextOps.unigramLogprob(spark, sf)
      .select("doc_id", "mean_logp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hits = batch.count { case (id, (lp, _)) => exact(id) == lp }
    assert(hits == batch.size, s"only $hits/${batch.size} match the exact twin")
  }
}
