package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale gate (dev tool, run per round; results recorded in SCALE.md).
  *
  * The driver ships sf0.001/0.01/0.1 only, so this synthesizes an
  * sf1-EQUIVALENT dataset (10× sf0.1) at [[OutDir]] and then runs every
  * declared query against it: per-query wall time, row count, and — for the
  * heaviest queries — a double-run order-insensitive fingerprint that
  * catches nondeterminism (tie-broken limits, unstable sorts) that only
  * surfaces once keys start colliding at larger scale.
  *
  * Synthesis detail: facts (lineitem, orders, events) are unioned key-shifted
  * copies; the corpus is perturbed PER COPY — every 4th document token gets a
  * copy tag (so cross-copy texts are NOT near-duplicates and the dedup
  * operators see realistic ~10× candidate growth, not a degenerate
  * every-doc-has-9-identical-twins blowup), and embedding copies get a small
  * per-copy offset (no artificial exact-dup vector ties). Dimension tables
  * stay as-is, like TPC-H's slower-growing dims.
  *
  *   sbt "runMain graft.ScaleGate"        # reuse synthesized data if present
  *   sbt "runMain graft.ScaleGate regen"  # force re-synthesis
  */
object ScaleGate {
  val OutDir = "/tmp/graft_sf1"
  val Copies = 10

  private def synthesize(spark: SparkSession, src: String): Unit = {
    def copies(base: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(i => shift(base, i)).reduce(_ union _)

    copies(Tables.lineitem(spark, src)) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
    }.repartition(32).write.mode("overwrite").parquet(s"$OutDir/lineitem.parquet")

    copies(Tables.orders(spark, src)) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
    }.repartition(16).write.mode("overwrite").parquet(s"$OutDir/orders.parquet")

    copies(Tables.events(spark, src)) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L))
    }.repartition(16).write.mode("overwrite").parquet(s"$OutDir/events.parquet")

    copies(Tables.documents(spark, src)) { (df, i) =>
      val txt =
        if (i == 0) col("text")
        else array_join(expr(
          // j % 4 == 3, NOT 0: the first token must stay unperturbed or
          // every copy's docs share one prefix block (c1…, c2…), which
          // gives prefix-blocked operators a single pathological block
          // instead of realistic 10x-grown blocks
          s"transform(split(text, ' '), (x, j) -> IF(j % 4 = 3, concat('c$i', x), x))"),
          " ")
      df.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.repartition(16).write.mode("overwrite").parquet(s"$OutDir/documents.parquet")

    copies(Tables.embeddings(spark, src)) { (df, i) =>
      val emb =
        if (i == 0) col("embedding")
        else expr(s"transform(embedding, x -> x + cast(${i * 0.001} as float))")
      df.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
        .withColumn("embedding", emb)
    }.repartition(8).write.mode("overwrite").parquet(s"$OutDir/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$OutDir/$t.parquet")
    }
  }

  /** Order-insensitive content fingerprint: sum + count of per-row hashes.
    * Two runs of a deterministic query must agree exactly. */
  private def fingerprint(df: DataFrame): (String, Long) = {
    // decimal sum: adding millions of +-2^63 hashes overflows an ANSI long
    val r = df
      .select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
      .agg(sum(col("h").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .head()
    (String.valueOf(r.getDecimal(0)), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-scale-gate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    if (args.contains("regen")
        || !new java.io.File(s"$OutDir/lineitem.parquet").exists()) {
      println("synthesizing sf1-equivalent data...")
      synthesize(spark, src)
    }
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => println(s"$t rows: ${Tables(spark, OutDir, t).count()}"))

    // warm pass (plan compilation + JIT) at sf0.001, as in Bench
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try FullExec.count(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val out = try Right(FullExec.count(fn(spark, OutDir))) catch {
        case e: Throwable => Left(e.toString.takeWhile(_ != '\n').take(160))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      out match {
        case Right(n) => println(f"$name%-22s $sec%7.2f s  $n%9d rows")
        case Left(m)  => println(f"$name%-22s $sec%7.2f s  ERROR $m")
      }
      (name, sec, out)
    }

    println("\n== determinism double-run (10 heaviest) ==")
    val heaviest = results.collect { case (n, s, Right(_)) => (n, s) }
      .sortBy(-_._2).take(10)
    var nondet = 0
    heaviest.foreach { case (name, _) =>
      val fn = SparkEntry.queries(name)
      val (f1, f2) = (fingerprint(fn(spark, OutDir)), fingerprint(fn(spark, OutDir)))
      val ok = f1 == f2
      if (!ok) nondet += 1
      println(f"$name%-22s ${if (ok) "deterministic" else s"MISMATCH $f1 vs $f2"}")
    }

    println("\n== salted vs AQE-only skew join (lineitem ⋈ part + groupBy) ==")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val li = Tables.lineitem(spark, OutDir)
    val part = Tables.part(spark, OutDir).withColumnRenamed("p_partkey", "l_partkey")
    def plainAgg(): Long = li.join(part, "l_partkey")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 4).as("total"))
      .count()
    def saltedAgg(): Long = graft.operators.SkewUtils
      .saltedJoin(li, part, "l_partkey", factor = 8,
        bigSaltSource = Seq("l_orderkey", "l_linenumber", "l_suppkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 4).as("total"))
      .count()
    plainAgg(); saltedAgg() // warm both plans
    val (ps, ss) = ((1 to 3).map(_ => timed(plainAgg())),
      (1 to 3).map(_ => timed(saltedAgg())))
    println(f"plain+AQE median ${ps.sorted.apply(1)}%.2f s  salted median ${ss.sorted.apply(1)}%.2f s")

    val total = results.map(_._2).sum
    val nErr = results.count(_._3.isLeft)
    println(f"\nTOTAL ${total}%.1f s, $nErr errors, $nondet nondeterministic")
    spark.stop()
  }
}
