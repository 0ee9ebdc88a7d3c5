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
