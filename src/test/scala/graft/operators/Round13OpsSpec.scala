package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants for the round-13 operator batch — the TPC-H completion
  * (Q2/Q9/Q11/Q16/Q20 on the fact-derived partsupp), the control-chart
  * family (CUSUM, EWMA, peak detection, STL anomalies), the stats
  * additions (t-closeness, Jarque-Bera, Grubbs, partial correlation,
  * Friedman, Cronbach's α), char profiling, CLV and Adamic-Adar. Each
  * query is also oracle-checked in the driver's DuckDB gate; these pin
  * the algebraic invariants a hash compare can't express (recursion ≡
  * closed-form identities, bounds, driver replays). */
class Round13OpsSpec extends SparkTestBase {

  test("tpchQ2: every returned row carries its part's minimum IN-REGION cost") {
    val rows = JoinOps.tpchQ2(spark, sf).collect()
    assert(rows.nonEmpty)
    // region-eligible suppliers: nation in ASIA (the query's correlation
    // is min over the REGION's suppliers, not all suppliers)
    val asiaNations = graft.Tables.nation(spark, sf)
      .join(graft.Tables.region(spark, sf)
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val asiaSupp = graft.Tables.supplier(spark, sf).collect()
      .filter(r => asiaNations.contains(r.getInt(2)))
      .map(_.getLong(0)).toSet
    val ps = JoinOps.derivedPartSupp(spark, sf).collect()
      .filter(r => asiaSupp.contains(r.getLong(1)))
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.map(_.getDouble(2)).min }
    rows.foreach { r =>
      val (p, cost) = (r.getLong(3), r.getDouble(5))
      assert(cost == ps(p), s"part $p cost $cost != min ${ps(p)}")
    }
  }

  test("tpchQ11: kept parts all exceed the threshold share of the total") {
    val v = JoinOps.tpchQ11(spark, sf).collect()
    assert(v.nonEmpty)
    // values descend and are positive
    val vals = v.map(_.getLong(1))
    assert(vals.sameElements(vals.sortBy(-(_: Long))))
    assert(vals.forall(_ > 0))
  }

  test("tpchQ16: supplier counts positive; excluded sizes absent") {
    val rows = JoinOps.tpchQ16(spark, sf).collect()
    assert(rows.nonEmpty)
    val sizes = Set(1, 4, 9, 14, 19, 24, 28, 35)
    rows.foreach { r =>
      assert(sizes.contains(r.getInt(2)))
      assert(r.getString(0) != "Brand#1" && r.getString(1) != "PROMO")
      assert(r.getLong(3) > 0)
    }
  }

  test("cusum: prefix-sum identity equals the driver max(0, ...) recursion") {
    // the whole point of the windowed rewrite: S+_t = P_t - min P_j must
    // equal the textbook recursion replayed sequentially on the driver
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().groupBy(_.getString(0))
    val got = EventOps.cusum(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    daily.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_.get(1).toString)
        .map(_.getLong(2).toDouble)
      val mu = xs.sum / xs.length
      val sigma = math.sqrt(xs.map(x => x * x).sum / xs.length - mu * mu)
      var s = 0.0; var alarms = 0L; var maxS = 0.0
      xs.foreach { x =>
        s = math.max(0.0, s + (x - mu))
        if (s > 4 * sigma) alarms += 1
        maxS = math.max(maxS, s)
      }
      val (gA, gM) = got(tpe)
      assert(gA == alarms, s"$tpe alarms $gA != $alarms")
      assert(math.abs(gM - maxS) < 1e-3, s"$tpe maxS $gM != $maxS")
    }
  }

  test("ewmaControl: final EWMA equals the driver fold; violations consistent") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().groupBy(_.getString(0))
    val got = EventOps.ewmaControl(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    daily.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_.get(1).toString)
        .map(_.getLong(2).toDouble)
      val ew = xs.reduceLeft((acc, x) => acc * 0.7 + x * 0.3)
      assert(math.abs(got(tpe) - ew) < 1e-3, s"$tpe ${got(tpe)} != $ew")
    }
  }

  test("peakDetect: every peak strictly exceeds both neighbors") {
    // timestamps keyed by toString (uniform format sorts correctly and
    // dodges the Timestamp/LocalDateTime session-API split)
    val hourly = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => r.get(1).toString -> r.getLong(2)).toMap }
    val peaks = EventOps.peakDetect(spark, sf).collect()
    assert(peaks.nonEmpty)
    peaks.foreach { r =>
      val (t, hr, c) = (r.getString(0), r.get(1).toString, r.getLong(2))
      val m = hourly(t)
      val prev = m.keys.filter(_ < hr)
      val nxt = m.keys.filter(_ > hr)
      assert(prev.nonEmpty && nxt.nonEmpty)
      assert(c > m(prev.max), s"$t $hr not > prev")
      assert(c > m(nxt.min), s"$t $hr not > next")
    }
  }

  test("stlAnomaly: flagged days deviate > 3 MAD under the driver's lower-median replay") {
    val res = EventOps.stlDecompose(spark, sf).collect()
      .map(r => math.round(r.getDouble(4) * 10000))
    val sorted = res.sorted
    def lowerMed(xs: Array[Long]): Long = xs.sorted.apply(
      math.ceil(xs.length / 2.0).toInt - 1)
    val med = lowerMed(sorted)
    val mad = lowerMed(res.map(v => math.abs(v - med)))
    val flagged = EventOps.stlAnomaly(spark, sf).collect()
    val expect = res.count(v => math.abs(v - med) > 3 * mad)
    assert(flagged.length == expect,
      s"${flagged.length} flagged vs $expect expected (med=$med mad=$mad)")
  }

  test("tCloseness: t in [0, 1] and class sizes conserve the table") {
    val rows = StatOps.tCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getDouble(3)
      assert(t >= 0.0 && t <= 1.0, s"t $t out of range")
    }
    assert(rows.map(_.getLong(2)).sum ==
      graft.Tables.customer(spark, sf).count())
  }

  test("jarqueBera: JB nonnegative; moments match a driver recompute") {
    val rows = StatOps.jarqueBera(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .groupBy(_.getString(0))
    val bySrc = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    docs.foreach { case (src, rs) =>
      val xs = rs.map(_.getLong(1).toDouble)
      val mu = xs.sum / xs.length
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / xs.length
      val skew = m3 / math.sqrt(m2 * m2 * m2)
      assert(math.abs(bySrc(src) - skew) < 1e-3, s"$src skew")
    }
  }

  test("grubbs: the reported outlier is the true max |x - mean| order") {
    val r = StatOps.grubbs(spark, sf).collect()
    assert(r.length == 1)
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100)
        .cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val n = cents.length.toLong
    val s = cents.map(_._2).sum
    val best = cents.map { case (k, c) => (math.abs(c * n - s), k) }
      .maxBy { case (d, k) => (d, -k) }
    assert(r(0).getLong(1) == best._2)
    assert(r(0).getDouble(3) > 0)
  }

  test("partialCorr: all four correlations bounded in [-1, 1]") {
    val r = StatOps.partialCorr(spark, sf).collect()
    assert(r.length == 1)
    (1 to 4).foreach { i =>
      if (!r(0).isNullAt(i)) {
        val v = r(0).getDouble(i)
        assert(v >= -1.0 && v <= 1.0, s"col $i = $v")
      }
    }
  }

  test("friedman: chi2 nonnegative, grid dimensions correct") {
    val r = StatOps.friedman(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) > 0 && r(0).getLong(1) > 0)
    assert(r(0).isNullAt(2) || r(0).getDouble(2) >= 0.0)
  }

  test("cronbachAlpha: alpha <= 1 and variance components positive") {
    val r = TextOps.cronbachAlpha(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(2) > 0 && r(0).getDouble(3) > 0)
    assert(r(0).isNullAt(4) || r(0).getDouble(4) <= 1.0)
  }

  test("charProfile: ratios in [0,1]; letter+space <= 1; chars conserve") {
    val rows = TextOps.charProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lr, sr, vr) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lr >= 0 && lr <= 1 && sr >= 0 && sr <= 1 && vr >= 0 && vr <= 1)
      assert(lr + sr <= 1.0001)
    }
  }

  test("clv: scores descend and match the closed form on returned rows") {
    val rows = AnalyticsOps.clv(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(5))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    rows.foreach { r =>
      val expect = r.getLong(3) / 100.0 * r.getLong(2) /
        (1.0 + r.getLong(4))
      assert(math.abs(r.getDouble(5) - expect) < 1e-3)
    }
  }

  test("chowTest: the two-regime fit never loses to the pooled line; F >= 0") {
    val r = StatOps.chowTest(spark, sf).collect()
    assert(r.length == 1)
    // RSS1 + RSS2 <= RSS_pooled is an OLS identity (each half's own line
    // fits its half at least as well as the shared line) — 4dp slack
    assert(r(0).getDouble(3) <= r(0).getDouble(2) + 1e-3)
    assert(r(0).isNullAt(4) || r(0).getDouble(4) >= 0.0)
  }

  test("granger: the full model never loses to the restricted; F >= 0") {
    val r = StatOps.granger(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).isNullAt(2) || r(0).getDouble(2) <= r(0).getDouble(1) + 1e-3)
    assert(r(0).isNullAt(3) || r(0).getDouble(3) >= 0.0)
  }

  test("tost: equivalence verdict consistent with the two t statistics") {
    val r = StatOps.tost(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(3) > 0) // se
    val eq = r(0).getBoolean(6)
    assert(eq == (r(0).getDouble(4) > 1.645 && r(0).getDouble(5) > 1.645))
  }

  test("acfPacf: ACF bounded, PACF(1) == ACF(1)") {
    val rows = StatOps.acfPacf(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0))
    val lag1 = rows.find(_.getInt(0) == 1).get
    assert(lag1.getDouble(1) == lag1.getDouble(2))
  }

  test("cohensD: sign matches the mean difference; |g| <= |d|") {
    val rows = StatOps.cohensD(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m1, m2, d, g) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(math.signum(d) == math.signum(m1 - m2) || d == 0.0)
      assert(math.abs(g) <= math.abs(d) + 1e-9)
    }
  }

  test("entropyRate: bounded by log2(types) and matches a driver recompute") {
    val r = TextOps.entropyRate(spark, sf).collect()
    assert(r.length == 1)
    val (types, h) = (r(0).getLong(1), r(0).getDouble(2))
    assert(h >= 0.0 && h <= math.log(types.toDouble) / math.log(2.0) + 1e-9)
    // driver replay over the collected corpus
    val docs = graft.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val pairs = docs.flatMap { t =>
      val toks = t.trim.toLowerCase.split("\\s+")
      toks.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }
    val bg = pairs.groupBy(identity).map { case (k, v) => k -> v.length }
    val un = bg.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val n = pairs.length.toDouble
    val hExp = -bg.iterator.map { case ((w1, _), c) =>
      (c / n) * (math.log(c.toDouble / un(w1)) / math.log(2.0))
    }.sum
    assert(math.abs(h - hExp) < 1e-3, s"$h vs $hExp")
  }

  test("hapax: per-source within-doc ratios live in [0, 1]") {
    val rows = TextOps.hapaxRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hr = r.getDouble(2)
      assert(hr >= 0.0 && hr <= 1.0)
    }
  }

  test("klDrift: symmetric KL nonnegative on every consecutive-day pair") {
    val rows = EventOps.klDrift(spark, sf).collect()
    val nDays = graft.Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays - 1)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0))
  }

  test("pqDistortion: one row per subspace, full corpus coverage, mse >= 0") {
    val rows = PqOps.pqDistortion(spark, sf).collect()
    assert(rows.length == 8)
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) == nVecs)
      assert(r.getDouble(2) >= 0.0)
      // normalized vectors: a subvector's norm² <= 1, and quantizing to a
      // trained codebook must beat the trivial all-zeros codeword bound
      assert(r.getDouble(2) <= 1.0)
    }
  }

  test("hillTail: x_k is the true 101st order statistic; alpha positive") {
    val r = StatOps.hillTail(spark, sf).collect()
    assert(r.length == 1)
    val lens = graft.Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).sortBy(-_)
    assert(r(0).getLong(1) == lens(100))
    assert(r(0).getDouble(2) > 0 && r(0).getDouble(3) > 0)
  }

  test("gumbelFit: beta positive, mu below the block-max mean") {
    val r = EventOps.gumbelFit(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(2) > 0)
    assert(r(0).getDouble(3) < r(0).getDouble(1))
  }

  test("recordCount: matches a driver sequential replay; Hn matches") {
    val r = EventOps.recordCount(spark, sf).collect()
    assert(r.length == 1)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(round(sum(col("value")), 4) * 10000).cast("long").as("y"))
      .collect().sortBy(_.get(0).toString).map(_.getLong(1))
    var mx = Long.MinValue; var recs = 0L
    daily.foreach { y => if (y > mx) { recs += 1; mx = y } }
    assert(r(0).getLong(1) == recs, s"${r(0).getLong(1)} vs $recs")
    val hn = (1 to daily.length).map(1.0 / _).sum
    assert(math.abs(r(0).getDouble(2) - hn) < 1e-3)
  }

  test("runsTest: run count matches a driver replay; z matches the closed form") {
    val r = EventOps.runsTest(spark, sf).collect()
    assert(r.length == 1)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(round(sum(col("value")), 4) * 10000).cast("long").as("y"))
      .collect().sortBy(_.get(0).toString).map(_.getLong(1))
    val med = daily.sorted.apply(math.ceil(daily.length / 2.0).toInt - 1)
    val signs = daily.map(_ > med)
    val runs = 1 + signs.sliding(2).count(p => p(0) != p(1))
    assert(r(0).getLong(2) == runs, s"${r(0).getLong(2)} vs $runs")
    assert(r(0).getLong(0) + r(0).getLong(1) == daily.length)
  }

  test("adamicAdar: scores positive, pairs are non-edges, AA <= n_common / ln 2") {
    val rows = GraphOps.adamicAdar(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = GraphOps.copurchaseEdgesShared(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, b, nc, aa) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))
      assert(!edges.contains((a, b)), s"($a,$b) is an edge")
      assert(aa > 0)
      // every common neighbor has degree >= 2, so each term <= 1/ln 2
      assert(aa <= nc / math.log(2.0) + 1e-9)
    }
  }
}
