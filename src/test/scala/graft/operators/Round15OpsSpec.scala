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

  /** A&S 7.1.26 erfc with the engine/oracle literals — the shared
    * closed-form p-value replay. */
  private def erfcAS(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-(x * x))
  }

  test("kpss: eta and the lrv ratio match a driver replay") {
    val ys = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("y")).orderBy(col("day"))
      .collect().map(_.getDouble(1))
    val n = ys.length
    val m = ys.sum / n
    val e = ys.map(_ - m)
    val s = e.scanLeft(0.0)(_ + _).drop(1)
    val l = SeriesOps.KpssLags
    val g = (0 to l).map(j => (j until n).map(t => e(t) * e(t - j)).sum)
    val lrvn = g(0) + (1 to l).map(j =>
      2.0 * (1.0 - j.toDouble / (l + 1)) * g(j)).sum
    val eta = (s.map(x => x * x).sum / (n.toDouble * n)) / (lrvn / n)
    val row = SeriesOps.kpssTest(spark, sf).collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getInt(1) == l)
    assert(math.abs(row.getDouble(2) - eta) < 1e-3)
    assert(math.abs(row.getDouble(3) - lrvn / g(0)) < 1e-3)
    assert(row.getDouble(2) > 0)
  }

  test("cochranArmitage: z and p match the closed form on independently recomputed wave counts") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val byWave = graft.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select((col("user_id") % InferenceOps.TrendWaves).as("wave"),
        (col("event_type") === "purchase").cast("long").as("conv"))
      .groupBy(col("wave"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTot = byWave.map(_._2).sum
    val cTot = byWave.map(_._3).sum
    val p = cTot.toDouble / nTot
    val sn = byWave.map { case (s, n, _) => s.toDouble * n }.sum
    val ssn = byWave.map { case (s, n, _) => s.toDouble * s * n }.sum
    val v = p * (1.0 - p) * (ssn - sn * sn / nTot)
    val z = (byWave.map { case (s, _, c) => s.toDouble * c }.sum - p * sn) /
      math.sqrt(v)
    val row = InferenceOps.cochranArmitage(spark, sf).collect()(0)
    assert(row.getInt(0) == byWave.length)
    assert(row.getLong(1) == nTot && row.getLong(2) == cTot)
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
    val pv = erfcAS(math.abs(z) * InferenceOps.InvSqrt2)
    assert(math.abs(row.getDouble(4) - pv) < 1e-3)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1.0)
  }

  test("bartlett: chi2 matches a driver replay from exact per-source moments") {
    val per = graft.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
        sum(col("n_chars") * col("n_chars")).as("s2"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2).toDouble, r.getLong(3).toDouble))
      .filter(_._1 > 1)
    val vis = per.map { case (n, s, s2) =>
      (n, (s2 - s * s / n) / (n - 1)) }.filter(_._2 > 0)
    val k = vis.length
    val nTot = vis.map(_._1).sum
    val df = (nTot - k).toDouble
    val sv = vis.map { case (n, v) => (n - 1) * v }.sum
    val sln = vis.map { case (n, v) => (n - 1) * math.log(v) }.sum
    val sinv = vis.map { case (n, _) => 1.0 / (n - 1) }.sum
    val corr = 1.0 + (sinv - 1.0 / df) / (3.0 * (k - 1))
    val chi2 = (df * math.log(sv / df) - sln) / corr
    val row = StatOps.bartlett(spark, sf).collect()(0)
    assert(row.getLong(0) == k && row.getLong(1) == nTot)
    assert(math.abs(row.getDouble(2) - corr) < 1e-3)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-2)
    assert(row.getDouble(3) >= 0)
  }

  test("moodMedian: grand median and per-source counts are exact; chi2 terms match the replay") {
    val lens = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = lens.map(_._2).sorted
    val nn = sorted.length
    val med = sorted((nn + 1) / 2 - 1) // lower median, 1-based ceil(N/2)
    val aa = lens.count(_._2 > med)
    val rows = StatOps.moodMedian(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nn)
    assert(rows.map(_.getLong(2)).sum == aa)
    rows.foreach { r =>
      val (src, nD, nA) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == med)
      assert(nD == lens.count(_._1 == src))
      assert(nA == lens.count(x => x._1 == src && x._2 > med))
      val eA = nD.toDouble * aa / nn
      val eB = nD.toDouble * (nn - aa) / nn
      val term = (nA - eA) * (nA - eA) / eA +
        ((nD - nA) - eB) * ((nD - nA) - eB) / eB
      assert(math.abs(r.getDouble(6) - term) < 1e-3)
    }
  }

  test("maxDrawdown: matches a per-type driver replay; bounds hold") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("v"))
      .orderBy(col("event_type"), col("day"))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val rows = EventOps.maxDrawdown(spark, sf).collect()
    rows.foreach { r =>
      val vs = daily.filter(_._1 == r.getString(0)).map(_._2)
      val cums = vs.scanLeft(0.0)(_ + _).drop(1)
      val peaks = cums.scanLeft(Double.MinValue)(math.max).drop(1)
      val mdd = peaks.zip(cums).map { case (p, c) => p - c }.max
      val mddp = peaks.zip(cums).collect {
        case (p, c) if p > 0 => (p - c) / p }.max
      assert(r.getLong(1) == vs.length)
      assert(math.abs(r.getDouble(2) - peaks.max) < 1e-2)
      assert(math.abs(r.getDouble(3) - mdd) < 1e-2)
      assert(math.abs(r.getDouble(4) - mddp) < 1e-4)
      assert(r.getDouble(3) >= 0 && r.getDouble(4) >= 0
        && r.getDouble(4) <= 1.0)
    }
  }

  test("turningPoints: count matches a driver replay on the scaled longs") {
    val yl = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("y"))
      .withColumn("yl", round(col("y") * 10000).cast("long"))
      .orderBy(col("day")).collect().map(_.getLong(2))
    val diffs = yl.sliding(2).map { case Array(a, b) => b - a }.toSeq
    val turns = diffs.sliding(2).count { case Seq(a, b) =>
      (a > 0 && b < 0) || (a < 0 && b > 0) }
    val n = yl.length
    val row = SeriesOps.turningPoints(spark, sf).collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == turns)
    val et = 2.0 * (n - 2.0) / 3.0
    assert(math.abs(row.getDouble(2) - et) < 1e-3) // engine value is round4'd
    assert(math.abs(row.getDouble(3) -
      (turns - et) / math.sqrt((16.0 * n - 29.0) / 90.0)) < 1e-3)
  }

  test("seasonalStrength: strengths match a driver replay over the declared stl output") {
    val comp = EventOps.stlDecompose(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    def vr(xs: Seq[Double]): Double = {
      val n = xs.length.toDouble
      (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / (n - 1)
    }
    val r = comp.map(_._3).toSeq
    val sr = comp.map(c => c._2 + c._3).toSeq
    val tr = comp.map(c => c._1 + c._3).toSeq
    val fs = math.max(0.0, 1.0 - vr(r) / vr(sr))
    val ft = math.max(0.0, 1.0 - vr(r) / vr(tr))
    val row = EventOps.seasonalStrength(spark, sf).collect()(0)
    assert(row.getLong(0) == comp.length)
    assert(math.abs(row.getDouble(1) - fs) < 1e-3)
    assert(math.abs(row.getDouble(2) - ft) < 1e-3)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1.0001)
  }

  test("pageTrend: L matches a driver midrank replay; consistent with friedman's layout") {
    val cells = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)), r.getLong(2)))
      .toMap
    val days = cells.keys.map(_._1).toSeq.distinct.sorted
    val types = cells.keys.map(_._2).toSeq.distinct.sorted
    val k = types.length
    // midranks within each day over the 0-filled grid
    var l = 0.0
    val rsums = scala.collection.mutable.Map[String, Double]()
    days.foreach { d =>
      val xs = types.map(t => t -> cells.getOrElse((d, t), 0L))
      xs.foreach { case (t, x) =>
        val below = xs.count(_._2 < x)
        val ties = xs.count(_._2 == x)
        val r = below + (ties + 1) / 2.0
        rsums(t) = rsums.getOrElse(t, 0.0) + r
      }
    }
    types.zipWithIndex.foreach { case (t, i) => l += (i + 1) * rsums(t) }
    val row = StatOps.pageTrend(spark, sf).collect()(0)
    assert(row.getLong(0) == days.length && row.getLong(1) == k)
    assert(math.abs(row.getDouble(2) - l) < 1e-6)
    val n = days.length.toDouble
    val el = n * k * (k + 1) * (k + 1) / 4.0
    assert(math.abs(row.getDouble(3) - el) < 1e-6)
  }

  test("brunnerMunzel: statistic matches a full driver replay") {
    val vs = graft.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    val s1 = vs.filter(_._1 == 0).map(_._2.toDouble)
    val s2 = vs.filter(_._1 == 1).map(_._2.toDouble)
    val pooled = s1 ++ s2
    def midranks(all: Seq[Double], xs: Seq[Double]): Seq[Double] =
      xs.map(x => all.count(_ < x) + (all.count(_ == x) + 1) / 2.0)
    val r1 = midranks(pooled, s1); val r2 = midranks(pooled, s2)
    val ri1 = midranks(s1, s1); val ri2 = midranks(s2, s2)
    val (n1, n2) = (s1.length.toDouble, s2.length.toDouble)
    val (m1, m2) = (r1.sum / n1, r2.sum / n2)
    def s2of(rp: Seq[Double], ri: Seq[Double], m: Double, n: Double) =
      rp.zip(ri).map { case (a, b) =>
        val d = a - b - m + (n + 1) / 2.0; d * d }.sum / (n - 1)
    val v1 = s2of(r1, ri1, m1, n1); val v2 = s2of(r2, ri2, m2, n2)
    val bm = n1 * n2 * (m2 - m1) / (n1 + n2) /
      math.sqrt(n1 * v1 + n2 * v2)
    val pHat = (m2 - (n2 + 1) / 2.0) / n1
    val row = StatOps.brunnerMunzel(spark, sf).collect()(0)
    assert(row.getLong(0) == s1.length && row.getLong(1) == s2.length)
    assert(math.abs(row.getDouble(2) - pHat) < 1e-3)
    assert(math.abs(row.getDouble(3) - bm) < 1e-3)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1.0)
  }

  test("hoover: transfer share matches a driver replay over the domain key") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def dom(id: Long, src: String): String = {
      val hex = md.digest(s"dom:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      if (h % 100 < DomainOps.MegaSharePct) s"$src.big0"
      else s"$src.${h % DomainOps.SmallBuckets}"
    }
    val per = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_toks"))
      .collect().map(r => (dom(r.getLong(0), r.getString(1)),
        r.getInt(2).toLong))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }
      .filter(_ > 0).toSeq
    val s = per.sum.toDouble; val nd = per.length.toDouble
    val hoov = per.map(x => math.abs(x / s - 1.0 / nd)).sum / 2.0
    val donors = per.count(_ / s > 1.0 / nd)
    val row = DomainOps.hoover(spark, sf).collect()(0)
    assert(row.getLong(0) == per.length && row.getLong(1) == per.sum)
    assert(math.abs(row.getDouble(2) - hoov) < 1e-3)
    assert(row.getLong(3) == donors)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1.0)
  }

  test("rocchioExpansion: terms come from the feedback docs, exclude query/stopwords, weights replay") {
    val rows = RetrievalOps.rocchioExpansion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= RetrievalOps.PrfExpansionTerms)
    val banned = (RetrievalOps.QueryTerms ++ Seq("the", "a", "of", "and")).toSet
    rows.foreach { case (t, tfFb, df, w) =>
      assert(!banned.contains(t) && t.length >= 3)
      assert(tfFb >= 1 && df >= 1)
      assert(w > 0)
    }
    // weights replay from the emitted integers + corpus size
    val nDocs = graft.Tables.documents(spark, sf).count().toDouble
    rows.foreach { case (_, tfFb, df, w) =>
      assert(math.abs(w - tfFb * math.log(nDocs / df)) < 1e-3)
    }
    // descending by rounded weight, ties by term
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._4 > b._4 || (a._4 == b._4 && a._1 < b._1) })
    // every term occurs in at least one of the BM25 top-10 feedback docs
    val fbIds = RetrievalOps.bm25TopK(spark, sf, RetrievalOps.PrfFeedbackDocs)
      .collect().map(_.getLong(0)).toSet
    val fbText = graft.Tables.documents(spark, sf)
      .filter(col("doc_id").isInCollection(fbIds))
      .collect().map(_.getAs[String]("text").toLowerCase).mkString(" ")
    rows.foreach { case (t, _, _, _) => assert(fbText.contains(t)) }
  }

  test("harmonicCentrality: matches a driver BFS replay from the shared edge table") {
    val edges = GraphOps.copurchaseEdgesShared(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }
    val deg = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity)
      .map { case (k, xs) => k -> xs.length }
    val seeds = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(GraphOps.BfsSeeds).map(_._1)
    // 4-hop BFS per seed
    def dists(seed: Long): Map[Long, Int] = {
      var d = Map(seed -> 0)
      var frontier = Set(seed)
      for (h <- 1 to GraphOps.BfsMaxHops) {
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(d.keySet)
        d ++= nxt.map(_ -> h)
        frontier = nxt
      }
      d
    }
    val scores = seeds.flatMap(s => dists(s).toSeq.filter(_._2 > 0))
      .groupBy(_._1)
      .map { case (node, xs) =>
        node -> ((xs.length, xs.map(x => 1.0 / x._2).sum)) }
    val expect = scores.toSeq
      .map { case (n, (c, h)) =>
        val r4 = BigDecimal(h).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        (n, c, r4)
      }
      .sortBy { case (n, _, h) => (-h, n) }
      .take(GraphOps.HarmonicTopN)
    val got = GraphOps.harmonicCentrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"node/count: $g vs $e")
      assert(math.abs(g._3 - e._3) < 1e-9, s"score: $g vs $e")
    }
  }
}
