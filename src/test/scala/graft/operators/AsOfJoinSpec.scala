package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L),
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 09:00:00"), 201L))
      .toDF("user_id", "ts", "view_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 11L),
      (1L, ts("2024-01-01 11:59:00"), 12L),
      (1L, ts("2024-01-01 13:00:00"), 13L), // after both left rows
      (3L, ts("2024-01-01 08:00:00"), 31L)) // different key
      .toDF("user_id", "ts", "purchase_id")

    val got = AsOfJoinOps.asOfJoin(left, right, "user_id", "ts", "purchase_id")
      .select("view_id", "purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got(101L) == 11L) // 09:30 is latest <= 10:00
    assert(got(102L) == 12L) // 11:59 is latest <= 12:00
    assert(got(201L) == -1L) // user 2 has no purchases -> null
  }

  test("asOfJoin: equal timestamps match (<= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "view_id")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 55L))
      .toDF("user_id", "ts", "purchase_id")
    val got = AsOfJoinOps.asOfJoin(left, right, "user_id", "ts", "purchase_id")
      .select("purchase_id").collect()
    assert(got.head.getLong(0) == 55L)
  }

  test("asOfJoin: a matched right row with NULL value propagates null") {
    // The latest right row at 10:00 has a null value; the operator must
    // carry that null, not fall back to the older 09:00 row's value.
    val left = Seq((1L, ts("2024-01-01 10:30:00"), 100L))
      .toDF("user_id", "ts", "view_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(7L)),
      (1L, ts("2024-01-01 10:00:00"), None: Option[Long]))
      .toDF("user_id", "ts", "purchase_id")
    val got = AsOfJoinOps.asOfJoin(left, right, "user_id", "ts", "purchase_id")
      .select("purchase_id").collect()
    assert(got.head.isNullAt(0))
  }

  test("set ops: intersect + except partition the base set") {
    val inter = SetOps.intersectCustomers(spark, sf).count()
    val exceptBoth = {
      import org.apache.spark.sql.functions._
      val c = graft.Tables.customer(spark, sf)
      c.filter(col("c_acctbal") > 0).select("c_custkey")
        .except(c.filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .select("c_custkey")).count()
    }
    val base = {
      import org.apache.spark.sql.functions._
      graft.Tables.customer(spark, sf).filter(col("c_acctbal") > 0)
        .select("c_custkey").distinct().count()
    }
    assert(inter + exceptBoth == base)
  }
}
