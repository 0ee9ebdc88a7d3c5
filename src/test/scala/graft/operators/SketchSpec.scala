package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SketchSpec extends SparkTestBase {

  test("HLL distinct counts within 5% of exact; approx median within 2%") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    SketchOps.approxStats(spark, sf).collect().foreach { r =>
      val (parts, median) = exact(r.getString(0))
      val apxParts = r.getLong(1)
      val apxMedian = r.getDouble(3)
      assert(math.abs(apxParts - parts).toDouble / parts < 0.05,
        s"flag ${r.getString(0)}: $apxParts vs $parts")
      assert(math.abs(apxMedian - median) / median < 0.02,
        s"flag ${r.getString(0)}: $apxMedian vs $median")
    }
  }

  test("hllRollup: union of per-group sketches equals the direct global sketch") {
    val out = SketchOps.hllRollup(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the ALL row came from sketch UNION; recompute with one direct global
    // sketch over the raw column — estimates must be identical, because
    // union is exact on the sketch lattice (not merely close)
    val direct = Tables.orders(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("n"))
      .head().getLong(0)
    assert(out("ALL")._1 == direct, s"${out("ALL")._1} vs $direct")
    // and each estimate is within 5% of its exact distinct count
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(out(k)._1 - n).toDouble / n < 0.05, s"$k: ${out(k)._1} vs $n")
    }
    assert(out("ALL")._2 == Tables.orders(spark, sf).count())
  }

  test("sketch results are stable across partitionings (merge commutativity)") {
    val a = SketchOps.approxStats(spark, sf).collect()
    val li = Tables.lineitem(spark, sf).repartition(16)
    val b = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("apx_parts"))
      .orderBy(col("l_returnflag")).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1)))
      .sameElements(b.map(r => (r.getString(0), r.getLong(1)))))
  }
}
