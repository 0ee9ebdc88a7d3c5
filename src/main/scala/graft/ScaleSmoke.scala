package graft

import org.apache.spark.sql.functions._

/** Scale-up stress driver (dev tool, not part of the gate): synthesizes a
  * ~20× lineitem (~12M rows) and a ~10× corpus by unioning key-shifted
  * copies of sf0.1, then runs the heavy operators end-to-end. The point is
  * evidence for the scale posture — plans must stay the same shape
  * (broadcast dims, partial aggs, selective candidate joins) and runtimes
  * must grow ~linearly, no memory blowups.
  *
  *   sbt "runMain graft.ScaleSmoke"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-scale-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val copies = args.headOption.map(_.toInt).getOrElse(20)

    val li0 = Tables.lineitem(spark, dir)
    val big = (0 until copies).map { i =>
      li0.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ union _).repartition(64)
    big.write.mode("overwrite").parquet("/tmp/graft_scale/lineitem")
    val lineitem = spark.read.parquet("/tmp/graft_scale/lineitem")
    println(s"lineitem rows: ${lineitem.count()}")

    def timed(name: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t) / 1e9}%.1f s ($n rows)")
    }

    timed("q1 pricing summary") {
      lineitem.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
        .count()
    }
    timed("join-agg vs orders (20x fact side)") {
      val orders = Tables.orders(spark, dir)
      lineitem.join(orders,
        pmod(col("l_orderkey"), lit(10000000L)) === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 4), count(lit(1)))
        .count()
    }
    timed("custom top-k per group") {
      plans.TopK.perGroup(lineitem, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true)), 10).count()
    }

    val docs0 = Tables.documents(spark, dir)
    val docsBig = (0 until math.max(copies / 2, 1)).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _)
    println(s"documents rows: ${docsBig.count()}")
    timed("minhash signatures (agg) over corpus") {
      operators.DedupOps.minhashSignaturesAgg(docsBig, 32).count()
    }
    timed("minhash signatures (scalar, shuffle-free) over corpus") {
      operators.DedupOps.minhashSignaturesScalar(docsBig, 32).count()
    }
    timed("lsh candidate pairs") {
      operators.DedupOps.minhashCandidates(
        operators.DedupOps.minhashSignatures(docsBig, 32)).count()
    }
    timed("tfidf top term per doc") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tf").desc, col("token"))
      val toks = docsBig.select(col("doc_id"),
        explode(functions.TextFunctions.tokensLower(col("text"))).as("token"))
      toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    spark.stop()
  }
}
