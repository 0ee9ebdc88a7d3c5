package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based approximate aggregation — the one-pass, merge-commutative
  * alternatives the 100 TB path substitutes for exact operators:
  * HyperLogLog++ (approx_count_distinct) for COUNT(DISTINCT), t-digest-style
  * approx_percentile for exact interpolated percentiles. Deterministic for
  * fixed data (sketch merges are commutative), but engine-specific, so the
  * declared query takes the rows-only check; ScalaTest bounds the error
  * against the exact aggregates.
  */
object SketchOps {

  /** Per-flag approximate distinct parts/suppliers + approximate median
    * price, next to the exact row count. */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("apx_parts"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("apx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("apx_median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Mergeable-sketch rollup with Apache DataSketches HLL (Spark 4's
    * `hll_sketch_agg` / `hll_union_agg`): per-status customer-distinct
    * sketches PLUS an 'ALL' row whose estimate comes from UNIONING the
    * per-group sketch binaries — never re-scanning the data. This is the
    * 100 TB cardinality pattern: materialize small per-partition/per-day
    * sketches once, answer any rollup later by sketch union alone (the
    * union is exact on the sketch lattice, so unioned-estimate ==
    * direct-global-estimate — asserted in SketchSpec). Rows-only: the
    * sketch registers are engine-specific, so no DuckDB oracle. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val perGroup = Materialize(
      Tables.orders(spark, dir)
        .groupBy(col("o_orderstatus"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          count(lit(1)).as("n_rows")))
    val global = perGroup
      .agg(hll_union_agg(col("sk")).as("sk"), sum(col("n_rows")).as("n_rows"))
      .select(lit("ALL").as("o_orderstatus"),
        hll_sketch_estimate(col("sk")).as("apx_custs"), col("n_rows"))
    perGroup
      .select(col("o_orderstatus"),
        hll_sketch_estimate(col("sk")).as("apx_custs"), col("n_rows"))
      .unionByName(global)
      .orderBy(col("o_orderstatus"))
  }

  /** q_heavy_hitters: frequent corpus tokens via the DataSketches
    * frequencies ItemsSketch ([[graft.functions.expressions.FreqItems]]) —
    * fixed-memory heavy-hitter detection where the exact vocabulary
    * aggregation (vocabTopK) needs a vocab-sized shuffle. One narrow
    * explode + ONE sketch aggregate whose per-partition binaries merge on
    * the partial-aggregate path; the declared map size (2¹⁵) exceeds the
    * fixture vocabulary at every SF, so the output here is the exact
    * frequency table and fully deterministic (bounds collapse, est = lb =
    * ub); at web scale the same query purges gracefully to provable
    * bounds. Rows-only: sketch internals are engine-specific; SketchSpec
    * pins the no-purge regime to exact counts and the purge regime to its
    * error bounds on a crafted heavy-tail stream. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 30,
      maxMapSize: Int = 1 << 15): DataFrame = {
    import graft.functions.TextFunctions.tokensLower
    import org.apache.spark.sql.GraftColumnBridge
    val freq = GraftColumnBridge.toColumn(
      graft.functions.expressions.FreqItems(
        GraftColumnBridge.toExpression(col("tok")), maxMapSize)
        .toAggregateExpression())
    Tables.documents(spark, dir)
      .select(explode(tokensLower(col("text"))).as("tok"))
      .agg(freq.as("items"))
      .select(explode(col("items")).as("f"))
      .select(col("f.item").as("token"), col("f.est").as("est"),
        col("f.lb").as("lb"), col("f.ub").as("ub"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
  }

  /** q_theta_audience: the full audience set-algebra grid from MERGEABLE
    * sketches — per-event-type theta sketches of user_id, then pairwise
    * intersection / A-not-B / union estimates evaluated on the aggregated
    * sketch table alone ([[graft.functions.expressions.ThetaPairStats]]).
    * This closes the set-operation gap HLL leaves open (q_hll_rollup can
    * union but never intersect): at 100 TB the facts are scanned ONCE into
    * |types| fixed-size binaries riding the partial-aggregate shuffle, and
    * every overlap/exclusive-audience question — including ones not known
    * at scan time — is answered from the sketch table in O(|types|²·2^lgK),
    * where the exact twin (q_audience_overlap) re-shuffles distinct
    * (type, user) pairs for each question. Oracle-checked: the fixture's
    * per-type audiences stay far below the 2^12 nominal capacity, so the
    * sketches never enter estimation mode and every estimate is the exact
    * distinct count (see ThetaSketchAgg's contract; ThetaSketchSpec pins
    * the estimation regime separately). */
  def thetaAudience(spark: SparkSession, dir: String, lgK: Int = 12)
      : DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import graft.functions.NumericFunctions.stableRound4
    val sk = GraftColumnBridge.toColumn(
      graft.functions.expressions.ThetaSketchAgg(
        GraftColumnBridge.toExpression(col("user_id")), lgK)
        .toAggregateExpression())
    // materialized: the pair grid reads BOTH sides of the self-join from
    // this |types|-row table — without it each side would re-run the full
    // fact scan + sketch aggregation
    val perType = Materialize(
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(sk.as("sk")))
    val pairs = perType.as("a")
      .join(broadcast(perType.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        GraftColumnBridge.toColumn(
          graft.functions.expressions.ThetaPairStats(
            GraftColumnBridge.toExpression(col("a.sk")),
            GraftColumnBridge.toExpression(col("b.sk")))).as("st"))
    pairs
      .select(col("type_a"), col("type_b"),
        col("st.n_inter").as("n_inter"),
        col("st.only_a").as("only_a"),
        col("st.only_b").as("only_b"),
        col("st.n_union").as("n_union"),
        stableRound4(col("st.n_inter").cast("double") / col("st.n_union"))
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
