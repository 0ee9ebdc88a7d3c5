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
}
