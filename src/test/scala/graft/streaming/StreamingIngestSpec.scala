package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.types.TimestampType

import graft.SparkTestBase

class StreamingIngestSpec extends SparkTestBase {

  test("file-stream ingest replays the chunk loop incrementally (R3)") {
    val base = Files.createTempDirectory("graft-ingest")
    val in = Files.createDirectories(base.resolve("in"))
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString
    val fixture = Paths.get(getClass.getResource("/yellow_sample.csv").getPath)

    // schema from a batch read of the fixture (a production job would pin it)
    val schema = spark.read.option("header", "true").option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX")
      .csv(fixture.toString).schema

    Files.copy(fixture, in.resolve("chunk1.csv"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingIngest.start(spark, in.toString, schema, out, cp)
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() == 7) // 10 - 3 zero-passenger rows

    // a second arriving file is a new micro-batch, appended exactly once
    Files.copy(fixture, in.resolve("chunk2.csv"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    q.stop()
    val result = spark.read.parquet(out)
    assert(result.count() == 14)
    assert(result.schema("tpep_pickup_datetime").dataType == TimestampType)
  }
}
