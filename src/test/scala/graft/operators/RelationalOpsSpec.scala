package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class RelationalOpsSpec extends SparkTestBase {

  test("scanLimit returns at most 100 rows, ordered by key") {
    val rows = RelationalOps.scanLimit(spark, sf).collect()
    assert(rows.length == 100)
    val keys = rows.map(r => (r.getLong(0), r.getInt(3)))
    assert(keys.sameElements(keys.sortBy(identity)))
  }

  test("filterNe + complement partition the table (R4/R5 invariant)") {
    val total = Tables.lineitem(spark, sf).count()
    val kept = RelationalOps.filterNe(spark, sf).count()
    val dropped = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") === 0).count()
    assert(kept + dropped == total)
  }

  test("isinCount matches a direct filter count") {
    val row = RelationalOps.isinCount(spark, sf).collect().head
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A")).count()
    assert(row.getAs[Long]("n_matching") == direct)
    assert(row.getAs[Long]("n_total") == Tables.lineitem(spark, sf).count())
  }

  test("schemaOnly echoes the schema with zero rows (R6)") {
    val df = RelationalOps.schemaOnly(spark, sf)
    assert(df.count() == 0)
    assert(df.schema == Tables.lineitem(spark, sf).schema)
  }

  test("chunkedAgg: group count bounded by flag×status combinations") {
    val rows = RelationalOps.chunkedAgg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("partitionAgg totals equal the orders row count") {
    val total = RelationalOps.partitionAgg(spark, sf)
      .agg(sum(col("n_orders"))).collect().head.getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("castTimestamp yields valid dates and hours") {
    val rows = RelationalOps.castTimestamp(spark, sf)
      .agg(min(col("hr")), max(col("hr")), count(lit(1))).collect().head
    assert(rows.getInt(0) >= 0 && rows.getInt(1) <= 23)
    assert(rows.getLong(2) == Tables.events(spark, sf).count())
  }

  test("upsert: updates replace, inserts append, untouched rows carry through") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B", 21.0), (9L, "z", 90.0)).toDF("k", "v", "x")
    val got = RelationalOps.upsert(target, updates, "k")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 21.0),
      (3L, "c", 30.0), (9L, "z", 90.0)))
    // a multi-row key in the target is fully replaced by its update row
    val dupTarget = Seq((2L, "b", 20.0), (2L, "b2", 22.0)).toDF("k", "v", "x")
    val got2 = RelationalOps.upsert(dupTarget, updates, "k")
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(2L, 9L))
  }

  test("zorderLayout: morton key derivation matches a reference interleave") {
    def morton(bx: Int, by: Int): Int =
      (0 until 8).map(i =>
        (((bx >> i) & 1) << (2 * i)) | (((by >> i) & 1) << (2 * i + 1))).sum
    // reference buckets straight from the table
    val rows = Tables.orders(spark, sf)
      .select(col("o_totalprice"), col("o_orderdate")).collect()
    val expect = rows.map { r =>
      val bx = math.min(math.floor(r.getDouble(0) / 2000).toInt, 255)
      val localDate = r.get(1) match {
        // interpret the instant in UTC (the pinned Spark session zone) —
        // toLocalDateTime would use the JVM default TZ and shift dates
        // near midnight on a non-UTC machine
        case t: java.sql.Timestamp =>
          t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
        case d: java.time.LocalDateTime => d.toLocalDate
      }
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(1992, 1, 1), localDate).toInt
      val by = ((days % 256) + 256) % 256
      (morton(bx, by) / 64, bx, by)
    }
    val expectAgg = expect.groupBy(_._1).map { case (z, g) =>
      z -> (g.length.toLong, g.map(_._2).min, g.map(_._2).max,
        g.map(_._3).min, g.map(_._3).max)
    }
    val got = RelationalOps.zorderLayout(spark, sf).collect()
    assert(got.length == expectAgg.size)
    got.foreach { r =>
      val e = expectAgg(r.getInt(0))
      assert((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5)) == e, s"zrange ${r.getInt(0)}")
    }
  }

  test("incrRollup merge equals the single-pass full recompute") {
    import graft.functions.NumericFunctions.stableRound4
    val full = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
        count(lit(1)).as("n_orders"),
        stableRound4(sum(col("o_totalprice")) / count(lit(1)))
          .as("avg_order"))
      .orderBy(col("day"))
      .collect()
    val merged = RelationalOps.incrRollup(spark, sf).collect()
    assert(merged.sameElements(full))
  }

  test("snapshotDiff counts match a driver replay of the change dials") {
    val out = RelationalOps.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deletes = rows.count(_._1 % 97 == 0)
    val inserts = rows.count(_._1 % 101 == 0)
    val updated = rows.filter { case (k, p) =>
      k % 97 != 0 && k % 13 == 0 && r4(p * 1.05) != p }
    val unchanged = rows.length - deletes - updated.length
    assert(out("delete")._1 == deletes && out("insert")._1 == inserts)
    assert(out("update")._1 == updated.length)
    assert(out("unchanged")._1 == unchanged)
    val drift = updated.map { case (_, p) => r4(p * 1.05) - p }.sum
    assert(math.abs(out("update")._2 - drift) < 1e-3, s"drift vs $drift")
    assert(out("insert")._2 == 0.0 && out("delete")._2 == 0.0)
  }

  test("incrJoinRollup: merged deltas equal a Spark-side from-scratch v2 recompute") {
    val merged = RelationalOps.incrJoinRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // independent recompute: build v2 by the same CDC rules, join, roll up
    val v1 = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        col("o_totalprice").as("price"))
    val v2 = v1.filter(col("key") % 97 =!= 0)
      .withColumn("price",
        when(col("key") % 13 === 0, round(col("price") * 1.05, 4))
          .otherwise(col("price")))
      .unionByName(v1.filter(col("key") % 101 === 0)
        .withColumn("key", col("key") + 1000000000L))
    val full = v2.join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("cust") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("price") * 10000).cast("long")).as("u"))
      .select(col("seg"), col("n_orders"),
        graft.functions.NumericFunctions.stableRound4(
          col("u").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(merged == full,
      s"incremental merge diverged from recompute:\n$merged\n$full")
  }

  test("pitJoin: as-of state replays from raw events; no future leakage; new users get 'none'") {
    val out = RelationalOps.pitJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getInt(4)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.size == purchases.length, "one row per purchase, exactly")
    val byUser = ev.groupBy(_._1)
    purchases.foreach { case (u, eid, _, us) =>
      val asof = us - 3600L * 1000000L
      // ground truth: the user's event-type state at the as-of instant is
      // the type of the latest event at or before it (state only changes
      // at events, so the SCD2 interval lookup must agree)
      val before = byUser(u).filter(e => e._4 <= asof)
      val expState =
        if (before.isEmpty) "none"
        else before.maxBy(e => (e._4, e._2))._3
      val (gotU, _, gotState, gotVer) = out(eid)
      assert(gotU == u)
      assert(gotState == expState, s"purchase $eid: $gotState vs $expState")
      // anti-leakage: a resolved version must never start after the as-of
      if (expState == "none") assert(gotVer == -1, s"purchase $eid version")
      else assert(gotVer >= 1, s"purchase $eid version")
    }
  }

  test("skipAudit: layouts agree on totals, pruning is sound, zorder helps both dims") {
    val out = RelationalOps.skipAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("day_price", "price_day", "zorder"))
    val nOrders = graft.Tables.orders(spark, sf).count()
    // the matching-row count is a property of the DATA, not the layout —
    // recompute it directly from the bucketization
    val expMatch = graft.Tables.orders(spark, sf)
      .select(
        least(floor(col("o_totalprice") / 2000), lit(255)).cast("int").as("bx"),
        pmod(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")),
          lit(256)).cast("int").as("by"))
      .filter(col("bx").between(10, 25) && col("by").between(40, 90))
      .count()
    out.values.foreach { r =>
      assert(r.getLong(3) == nOrders, s"rows_total: $r")
      assert(r.getLong(5) == expMatch, s"rows_matching: $r")
      // pruning soundness: every matching row is inside a scanned range
      assert(r.getLong(4) >= r.getLong(5), s"scanned < matching: $r")
      assert(r.getLong(2) <= r.getLong(1), s"scanned ranges > ranges: $r")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0, s"scan_frac: $r")
    }
    // the 2-D point of Z-order: it must beat the layout whose LEADING
    // dimension the predicate does not constrain tightly — i.e. it never
    // scans more than the WORSE of the two single-dimension layouts
    val worst = math.max(out("price_day").getLong(4), out("day_price").getLong(4))
    assert(out("zorder").getLong(4) <= worst,
      s"zorder scanned ${out("zorder").getLong(4)} > worst single-dim $worst")
  }
}
