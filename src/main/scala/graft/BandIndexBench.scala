package graft

import org.apache.spark.sql.functions._

/** Dev measurement for the standing band index (SCALE.md round 10):
  * build the corpus-side MinHash band index ON STORAGE once, then compare
  * probing a new batch against the stored index vs re-running the full
  * [[graft.operators.DedupOps.dedupIncrNear]] recompute (which re-signs
  * the corpus every time). Warm medians of 3.
  *
  *   sbt "runMain graft.BandIndexBench [sfDir]"
  */
object BandIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("graft-band-index-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-band-index-bench").toString
    val docs = Tables.documents(spark, sfDir)
    val firstHex = substring(md5(col("doc_id").cast("string")), 1, 1)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      f // warm-up (codegen compile)
      Seq(timed(f), timed(f), timed(f)).sorted.apply(1)
    }
    val tBuild = timed(
      graft.operators.DedupOps.bandIndexAppend(
        docs.filter(firstHex =!= "f"), idx))
    val batch = docs.filter(firstHex === "f")
      .select(col("doc_id"), col("text"))
    val tProbe = median3(
      graft.operators.DedupOps.bandIndexProbe(spark, idx, batch)
        .foreach(_ => ()))
    val tRecompute = median3(
      graft.operators.DedupOps.dedupIncrNear(spark, sfDir)
        .foreach(_ => ()))
    println(f"[bandindex] sf=$sfDir build_once=$tBuild%.2fs " +
      f"probe_from_storage=$tProbe%.2fs full_recompute=$tRecompute%.2fs " +
      f"speedup=${tRecompute / tProbe}%.2fx")
    spark.stop()
  }
}
