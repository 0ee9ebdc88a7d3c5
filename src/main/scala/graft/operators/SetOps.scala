package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operators (union / intersect / except / distinct) — absent from the
  * reference (SURVEY.md §2.1 "set operations: No") but part of any complete
  * relational surface. All plan as hash-partition + hash-dedup; at scale
  * each is one shuffle on the full row key.
  */
object SetOps {

  /** UNION (dedup): high-value ∪ urgent orders. */
  def unionOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_totalprice") > 200000)
      .select("o_orderkey", "o_orderstatus")
      .union(o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderstatus"))
      .distinct()
      .orderBy("o_orderkey")
  }

  /** INTERSECT: customers present in both predicate sets. */
  def intersectCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_acctbal") > 0).select("c_custkey")
      .intersect(c.filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** EXCEPT: positive-balance customers minus the BUILDING segment. */
  def exceptCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_acctbal") > 0).select("c_custkey")
      .except(c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** SELECT DISTINCT on a composite key. */
  def distinctStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Schema-evolving union: `unionByName(allowMissingColumns = true)` over
    * two projections with different column sets — absent columns fill with
    * null, matching by NAME not position (the heterogeneous-batch shape of
    * appending differently-shaped exports; cf. DuckDB UNION ALL BY NAME). */
  def unionByNameOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val big = o.filter(col("o_totalprice") > 200000)
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"),
        lit("hi").as("src"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("src"),
        col("o_orderpriority"))
    big.unionByName(urgent, allowMissingColumns = true)
      .orderBy(col("o_orderkey"), col("src"))
  }
}
