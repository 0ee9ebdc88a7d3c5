package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Invariants for the round-15 batch: the two evidence-complete default
  * flips (q_sprt → sprtSharded; the percentile family → tolerance-oracled
  * sketch primaries) plus the round's new operators as they land. */
class Round15OpsSpec extends SparkTestBase {

  test("q_sprt registry points at the sharded plan (r15 flip)") {
    // the declared form must now BE the distributed rewrite; the simple
    // per-arm walk stays as the documented contrast, bitwise-identical
    val declared = SparkEntry.queries("q_sprt")(spark, sf)
      .collect().map(_.toString).toSeq
    val sharded = StatOps.sprtSharded(spark, sf)
      .collect().map(_.toString).toSeq
    val contrast = StatOps.sprt(spark, sf)
      .collect().map(_.toString).toSeq
    assert(declared == sharded, "registry must serve sprtSharded")
    assert(declared == contrast, "flip must preserve the decision rows")
  }

  test("sketch primaries: rank audits hold and exact columns match the dials") {
    // q_winsorize_sketch: booleans TRUE, (n, avg_raw) bitwise-equal to
    // the exact contrast dial
    val ws = AnalyticsOps.winsorizeSketch(spark, sf).collect()
    assert(ws.nonEmpty)
    ws.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"winsorize cut outside rank band: $r")
    }
    val wExact = AnalyticsOps.winsorize(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    ws.foreach { r =>
      assert(wExact(r.getString(0)) == ((r.getLong(1), r.getDouble(2))))
    }
    // q_mad_outlier_sketch: both medians' rank audits hold
    val ms = AnalyticsOps.madOutlierSketch(spark, sf).collect()
    assert(ms.nonEmpty)
    ms.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"mad sketch outside rank band: $r")
    }
    // q_stats_agg_sketch: per-GROUP rank audits hold; sd/n_parts match
    // the exact dial
    val ss = AnalyticsOps.statsAggSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sExact = AnalyticsOps.statsAgg(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(ss.keySet == sExact.keySet)
    ss.foreach { case (k, r) =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"$k per-group percentile outside rank band: $r")
      assert(sExact(k) == ((r.getDouble(1), r.getLong(2))),
        s"$k exact columns must match the dial")
    }
  }

  test("sketch primaries carry no O(n) exact-percentile aggregation state") {
    // the whole point of the r15 flip: the declared plans must contain
    // approx_percentile only — any exact `percentile(` in the optimized
    // plan means a full-value-buffer reducer state snuck back in
    for (q <- Seq("q_winsorize_sketch", "q_mad_outlier_sketch",
        "q_stats_agg_sketch")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString.toLowerCase
      assert(!plan.replace("approx_percentile(", "").contains("percentile("),
        s"$q plan contains an exact percentile aggregate")
    }
  }

  private def dailyXY(): Seq[(Double, Double)] = {
    import org.apache.spark.sql.functions.{to_date => td}
    graft.Tables.events(spark, sf)
      .groupBy(td(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"),
        round(sum(col("value")), 4).as("y"))
      .orderBy(col("day"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
  }

  test("xiCorr: matches an exact driver replay of the general-ties formula") {
    val xy = dailyXY()
    def xi(pairs: Seq[(Double, Double)]): Double = {
      val n = pairs.length
      val ys = pairs.map(_._2)
      // order by (x, arrival) — arrival = day order of the collected seq
      val ordered = pairs.zipWithIndex.sortBy { case ((x, _), i) => (x, i) }
      val r = ordered.map { case ((_, y), _) => ys.count(_ <= y).toDouble }
      val l = ys.map(y => ys.count(_ >= y).toDouble)
      val sumDr = r.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum
      val denom = l.map(li => li * (n - li)).sum
      1.0 - n * sumDr / (2.0 * denom)
    }
    val got = StatOps.xiCorr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expXy = xi(xy)
    val expYx = xi(xy.map(_.swap))
    def r4(v: Double) = BigDecimal(v).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got("volume_to_revenue") - r4(expXy)) < 1e-9)
    assert(math.abs(got("revenue_to_volume") - r4(expYx)) < 1e-9)
  }

  test("pettitt: K, split day and p match a driver replay") {
    val d = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("y"))
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1))).toSeq
    val n = d.length
    val ys = d.map(_._2)
    val ranks = ys.map(y =>
      ys.count(_ < y) + (ys.count(_ == y) + 1) / 2.0)
    val us = (1 until n).map { t =>
      val cum = ranks.take(t).sum
      (d(t - 1)._1, 2.0 * cum - t.toDouble * (n + 1))
    }
    // tie-break earliest day on equal |U|
    val k = us.map(x => math.abs(x._2)).max
    val firstDay = us.find(x => math.abs(x._2) == k).get._1
    val row = SeriesOps.pettitt(spark, sf).collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == k.toLong)
    assert(row.getDate(2).toString == firstDay)
    val p = math.min(1.0, 2.0 * math.exp(-6.0 * k * k /
      (math.pow(n.toDouble, 3.0) + n.toDouble * n)))
    assert(math.abs(row.getDouble(3) - p) < 1e-5)
  }

  test("crossCorr: full lag grid, n_pairs = n - |lag|, ccf(0) = Pearson r") {
    val xy = dailyXY()
    val n = xy.length
    val rows = SeriesOps.crossCorr(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet == (-SeriesOps.CcfMaxLag to SeriesOps.CcfMaxLag).toSet)
    rows.foreach { case (k, (np, _)) => assert(np == n - math.abs(k)) }
    val mx = xy.map(_._1).sum / n; val my = xy.map(_._2).sum / n
    val num = xy.map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = math.sqrt(xy.map(v => (v._1 - mx) * (v._1 - mx)).sum *
      xy.map(v => (v._2 - my) * (v._2 - my)).sum)
    assert(math.abs(rows(0)._2 - num / den) < 1e-3)
    rows.foreach { case (_, (_, r)) => assert(r >= -1.0001 && r <= 1.0001) }
  }

  test("wilcoxonSigned: W+, z and p match a driver replay") {
    val d = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"))
      .collect().map(r => r.getLong(1) - r.getLong(2)).filter(_ != 0L)
    val n = d.length.toDouble
    val ad = d.map(math.abs)
    val rank = ad.map(a =>
      ad.count(_ < a) + (ad.count(_ == a) + 1) / 2.0)
    val wPlus = d.zip(rank).filter(_._1 > 0).map(_._2).sum
    val tie = ad.distinct.map(a => ad.count(_ == a).toDouble)
      .map(t => t * t * t - t).sum
    val sig = math.sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0 - tie / 48.0)
    val z = (wPlus - n * (n + 1) / 4.0) / sig
    val row = StatOps.wilcoxonSigned(spark, sf).collect()(0)
    assert(row.getLong(0) == d.length)
    assert(math.abs(row.getDouble(1) - wPlus) < 1e-9)
    assert(math.abs(row.getDouble(2) - z) < 1e-4)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1.0001)
  }

  test("spectralEntropy: bounds, and the dominant k is the periodogram argmax") {
    val row = SeriesOps.spectralEntropy(spark, sf).collect()(0)
    assert(row.getInt(0) == SeriesOps.PeriodogramK)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1.0001,
      "entropy_norm must be in [0,1]")
    assert(row.getDouble(5) > 0 && row.getDouble(5) <= 1.0001,
      "flatness must be in (0,1]")
    val pg = SeriesOps.periodogram(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
    val kDom = pg.minBy { case (k, p) => (-p, k) }._1
    assert(row.getInt(1) == kDom)
  }

  test("theilIndex: matches a driver replay over the two-tier domain key") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def dom(id: Long, src: String): String = {
      val hex = md.digest(s"dom:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      if (h % 100 < DomainOps.MegaSharePct) s"$src.big0"
      else s"$src.${h % DomainOps.SmallBuckets}"
    }
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .as("n_toks"))
      .collect().map(r => (dom(r.getLong(0), r.getString(1)),
        r.getInt(2).toLong))
    val per = toks.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }
      .filter(_ > 0).toSeq
    val nd = per.length.toDouble
    val sSum = per.sum.toDouble
    val mu = sSum / nd
    val t = per.map(x => (x / mu) * math.log(x / mu)).sum / nd
    val l = per.map(x => -math.log(x / mu)).sum / nd
    val row = DomainOps.theilIndex(spark, sf).collect()(0)
    assert(row.getLong(0) == per.length)
    assert(row.getLong(1) == per.sum)
    assert(math.abs(row.getDouble(2) - t) < 1e-3)
    assert(math.abs(row.getDouble(3) - l) < 1e-3)
    assert(row.getDouble(2) >= 0 && row.getDouble(3) >= 0)
  }
}
