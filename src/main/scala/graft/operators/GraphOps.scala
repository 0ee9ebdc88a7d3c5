package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the co-purchase graph: parts are nodes, and an
  * (undirected, simple) edge connects two parts that appear in the same
  * order. This is the item-item graph every recommender / basket-analysis
  * pipeline builds from a transaction log (cf. the reference's events+orders
  * model, `ingest_data.py:41-85`, which stops at flat aggregation — the graph
  * ops are the natural next stage of the same data).
  *
  * Scale shape, in order of operation:
  *   1. Edge construction is a per-order self-join — the explosion is
  *      bounded by basket size (TPC-H-style orders hold ≤ ~13 distinct
  *      parts, so ≤ C(13,2) = 78 pairs per order), NOT by graph size. One
  *      distinct-shuffle collapses multiplicity. A real 100 TB log with
  *      pathological baskets (a crawler hitting every item) would cap the
  *      basket first — the `maxBasket` guard below — because a single
  *      10⁵-item basket alone contributes 5·10⁹ pairs.
  *   2. Triangle counting orients every edge from the lower-(degree, id)
  *      endpoint to the higher one (Cohen / Suri-Vassilvitskii's MapReduce
  *      scheme): each wedge is then generated at its lowest-degree apex, so
  *      the join fan-out is Σ d_out(v)² with d_out ≤ √(2·|E|) — bounded even
  *      on power-law graphs where the unoriented Σ d(v)² blows up on hub
  *      nodes. The count is identical to the naive a<b<c enumeration (the
  *      oracle's formulation); only the generation order changes.
  *   3. PageRank keeps rank state distributed (an O(|V|) DataFrame — never
  *      on the driver) and runs a fixed number of join+aggregate rounds,
  *      re-materializing ranks each round ([[Materialize]]) so the plan
  *      stays flat instead of nesting 2·k joins deep.
  */
object GraphOps {

  /** Distinct co-purchase edges (src < dst), basket-capped. */
  def copurchaseEdges(spark: SparkSession, dir: String,
      maxBasket: Int = 64): DataFrame = {
    // distinct (order, part) first: a part twice in one order (two line
    // items) must not double-register the pair
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    // basket-size guard: drop pathological baskets BEFORE the pair join —
    // the quadratic term must never reach the shuffle
    val sized = op
      .withColumn("basket",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("okey"))))
      .where(col("basket") <= maxBasket)
      .drop("basket")
    sized.as("a")
      .join(sized.as("b"),
        col("a.okey") === col("b.okey") && col("a.pkey") < col("b.pkey"))
      .select(col("a.pkey").as("src"), col("b.pkey").as("dst"))
      .distinct()
  }

  /** Degree per node over the undirected edge set (each edge counts toward
    * both endpoints). One union + one aggregation shuffle. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))

  /** q_graph_degree: degree distribution of the co-purchase graph —
    * (degree, n_nodes), the first diagnostic anyone runs on a new graph.
    * Two aggregation shuffles, the second over ≤ max-degree rows. */
  def graphDegree(spark: SparkSession, dir: String): DataFrame =
    degrees(copurchaseEdges(spark, dir))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  /** q_triangles: top-20 parts by triangle participation, via the
    * edge-⋈-adjacency-intersection formulation: orient every edge from the
    * lower-(degree, id) endpoint (Cohen / Suri-Vassilvitskii), group the
    * oriented out-neighborhoods into per-node sorted arrays, then for each
    * oriented edge (u, v) the triangles through it are exactly
    * |adj(u) ∩ adj(v)| — one codegen'd array intersection per edge.
    *
    * Why not the textbook wedge self-join: this graph is near-regular
    * (basket-bounded), so Σ d_out² wedges ≈ 40–80 M rows at bench SF —
    * materializing them through a shuffle is the whole cost. Here NOTHING
    * wedge-sized ever shuffles: the big operands are |E| edge rows joined
    * twice with |V| adjacency rows, and the intersection happens inside
    * the join projection. The adjacency array is bounded by the max
    * ORIENTED out-degree ≤ √(2·|E|) (the orientation's arboricity bound),
    * which is what keeps rows bounded on power-law graphs too.
    *
    * Per-node attribution: edge (u, v) with common out-neighbors W adds
    * |W| to u and v, and 1 to each w ∈ W (explode of the intersection —
    * bounded by 3 · #triangles, the output's own size). */
  def triangleTop(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val edges = Materialize(copurchaseEdges(spark, dir))
    val deg = degrees(edges)
    val oriented = edges
      .join(deg.withColumnRenamed("node", "src")
        .withColumnRenamed("degree", "dsrc"), "src")
      .join(deg.withColumnRenamed("node", "dst")
        .withColumnRenamed("degree", "ddst"), "dst")
      .select(
        when(col("dsrc") < col("ddst")
            || (col("dsrc") === col("ddst") && col("src") < col("dst")),
          struct(col("src").as("u"), col("dst").as("v")))
          .otherwise(struct(col("dst").as("u"), col("src").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val o = Materialize(oriented)
    val adj = Materialize(o.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs")))
    val common = o
      .join(adj, "u")
      .join(adj.select(col("u").as("v"), col("nbrs").as("nbrs_v")), "v")
      .select(col("u"), col("v"),
        array_intersect(col("nbrs"), col("nbrs_v")).as("common"))
      .select(col("u"), col("v"), col("common"),
        size(col("common")).as("n_common"))
      .filter(col("n_common") > 0)
    // u and v each gain n_common triangles via this edge; each common w
    // gains exactly 1 — a weighted union, re-aggregated per node
    val mat = Materialize(common)
    mat.select(col("u").as("part_id"),
        col("n_common").cast("long").as("n_raw"))
      .unionAll(mat.select(col("v").as("part_id"),
        col("n_common").cast("long").as("n_raw")))
      .unionAll(mat.select(explode(col("common")).as("part_id"),
        lit(1L).as("n_raw")))
      .groupBy(col("part_id"))
      .agg(sum(col("n_raw")).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("part_id"))
      .limit(k)
  }

  /** PageRank on the undirected co-purchase graph: damping 0.85, `iters`
    * synchronous rounds from a uniform 1/N start, teleport mass spread
    * uniformly. Undirected ⇒ every edge-listed node has degree ≥ 1, so
    * there is no dangling mass.
    *
    * State stays distributed: ranks are an O(|V|) DataFrame updated by one
    * (ranks ⋈ directed-edges) + groupBy-sum per round — the driver only
    * holds N (one scalar). Each round's ranks are re-materialized so the
    * plan is flat (round r never re-executes rounds 1..r-1); on a real
    * cluster the same loop runs with reliable checkpointing instead of
    * local blocks. Rank totals are conserved at 1.0 up to float error.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 5,
      damping: Double = 0.85, k: Int = 20): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val edges = Materialize(copurchaseEdges(spark, dir))
    // adjacency-grouped edges: ONE |V|-row table, built once — per
    // iteration the |E|-sized row set exists only inside the explode of a
    // joined projection, so edges are never re-shuffled (the round-4
    // rewrite: the per-iteration edge⋈rank join shuffled |E| rows × iters)
    val adj = Materialize(
      edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        .groupBy(col("src"))
        .agg(collect_list(col("dst")).as("nbrs")))
    val n = adj.count()
    val teleport = (1.0 - damping) / n
    // the rank chain is LINEAR — each iteration's output feeds exactly the
    // next — so no per-iteration checkpoint is needed: the whole loop is
    // one job of iters×(join + aggregate) stages over the materialized adj
    var ranks = adj.select(col("src").as("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      // |V|⋈|V| join (tiny vs |E|), explode distributes rank/odeg to each
      // neighbor, map-side partial sums shrink the shuffle to |V| rows
      val contrib = adj
        .join(ranks, adj("src") === ranks("node"))
        .select(explode(col("nbrs")).as("node"),
          (col("rank") / size(col("nbrs"))).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("inflow"))
      // undirected ⇒ no isolated or dangling nodes: every node has degree
      // ≥ 1, so contrib covers the full node set (inner shape, no left)
      ranks = contrib.select(col("node"),
        (lit(teleport) + lit(damping) * col("inflow")).as("rank"))
    }
    ranks
      .select(col("node").as("part_id"), stableRound4(col("rank")).as("rank"))
      .orderBy(col("rank").desc, col("part_id"))
      .limit(k)
  }

  /** q_lift: association-rule mining over the same co-purchase baskets —
    * top-20 part pairs by lift with a minimum pair support, the
    * support/confidence/lift triple of classic market-basket analysis.
    * Exact integer counts until the three final divisions.
    *
    * Scale shape: identical to [[copurchaseEdges]] (bounded per-basket
    * pair join + one aggregation) — pair support is the aggregation COUNT
    * instead of a distinct; item supports are one more groupBy on the
    * (order, part) set; N is a scalar. The min-support filter runs BEFORE
    * the item-support join, so only surviving pairs join. */
  def liftPairs(spark: SparkSession, dir: String, k: Int = 20,
      minPair: Long = 2, maxBasket: Int = 64): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    val sized = op
      .withColumn("basket",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("okey"))))
      .where(col("basket") <= maxBasket)
      .drop("basket")
    val o = Materialize(sized)
    val nOrders = o.select(col("okey")).distinct().count()
    val item = o.groupBy(col("pkey")).agg(count(lit(1)).as("n_item"))
    val pairs = o.as("a")
      .join(o.as("b"),
        col("a.okey") === col("b.okey") && col("a.pkey") < col("b.pkey"))
      .groupBy(col("a.pkey").as("src"), col("b.pkey").as("dst"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    pairs
      .join(item.select(col("pkey").as("src"), col("n_item").as("n_src")), "src")
      .join(item.select(col("pkey").as("dst"), col("n_item").as("n_dst")), "dst")
      .select(col("src"), col("dst"), col("n_pair"), col("n_src"), col("n_dst"),
        stableRound4(col("n_pair").cast("double") / nOrders).as("support"),
        stableRound4(col("n_pair").cast("double") / col("n_src"))
          .as("confidence"),
        stableRound4(col("n_pair").cast("double") * nOrders
          / (col("n_src").cast("double") * col("n_dst"))).as("lift"))
      .orderBy(col("lift").desc, col("src"), col("dst"))
      .limit(k)
  }
}
