package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class JoinOpsSpec extends SparkTestBase {

  test("joinEnrich preserves all orders (FK integrity, inner joins)") {
    assert(JoinOps.joinEnrich(spark, sf).count()
      == Tables.orders(spark, sf).count())
  }

  test("joinEnrich plans broadcast joins for all dimension sides") {
    val plan = JoinOps.joinEnrich(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("semi + anti on the same key partition the left side") {
    val semi = JoinOps.semiJoin(spark, sf).count()
    val lineitemHi = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 45)
    val anti = Tables.orders(spark, sf).join(
      lineitemHi,
      col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(semi + anti == Tables.orders(spark, sf).count())
  }

  test("topK: at most 5 per group, descending within group") {
    val rows = JoinOps.topK(spark, sf).collect()
    val byGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byGroup.values.foreach { g =>
      assert(g.length <= 5)
      val prices = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("outerJoin covers the union of both key sets exactly once") {
    val customer = Tables.customer(spark, sf)
    val orders = Tables.orders(spark, sf)
    val expected = customer.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      .union(orders.select(col("o_custkey"))).distinct().count()
    val out = JoinOps.outerJoin(spark, sf)
    assert(out.count() == expected)
    assert(out.select(col("custkey")).distinct().count() == expected)
    assert(out.filter(col("custkey").isNull).count() == 0)
    // rows with null seg are exactly the low-balance customers with orders
    val lowBalWithOrders = customer.filter(col("c_acctbal") <= 5000)
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .count()
    assert(out.filter(col("seg").isNull).count() == lowBalWithOrders)
  }

  test("joinAgg revenue is positive for every nation present") {
    val rows = JoinOps.joinAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }
}
