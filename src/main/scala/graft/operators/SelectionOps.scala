package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Diversity-aware training-data SELECTION over the embedding corpus —
  * the step after dedup/quality-filter in a data-curation pipeline, where
  * a bounded example budget must cover the space rather than oversample
  * its dense center (cf. coreset selection, Sener & Savarese 2018, and
  * MMR re-ranking, Carbonell & Goldstein 1998).
  *
  * Determinism contract (what makes these oracle-able): all geometry runs
  * on INTEGER-quantized embeddings — each coordinate passes the stable4
  * barrier and scales to a long (the q_embed_drift idiom), so distances
  * and dot products are exact integer arithmetic, argmax/argmin never tie
  * on float noise, and remaining ties break on vec_id. Both engines
  * replay the identical greedy trajectory.
  *
  * Scale shape: both operators keep the corpus distributed and pull only
  * bounded MODEL state to the driver (k selected centers / a `poolSize`
  * candidate pool — the same budget class as the IVF/PQ trainers'
  * centroid pulls). Per-step work is one codegen'd integer expression
  * scan; nothing quadratic in the corpus ever forms.
  */
object SelectionOps {

  /** Shared engine/oracle tuning constants — the oracle SQL interpolates
    * these, so the two sides cannot drift (the IvfOps.DefaultK lesson). */
  val KCenterK = 8
  val MmrPool = 32
  val MmrK = 10
  /** λ=0.7 as exact integer weights over a ×10 score scale. */
  val MmrRelWeight = 7L
  val MmrSimWeight = 3L

  /** Per-coordinate integer quantization: stable4-round the double value,
    * scale by 10⁴, cast long — exact in both engines from the same
    * parquet floats. */
  private def quantized(emb: DataFrame): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    emb.select(col("vec_id"), transform(col("embedding"), x =>
      round(stableRound4(x.cast("double")) * 10000).cast("long")).as("q"))
  }

  /** Exact integer squared-L2 distance from the quantized vector column
    * to a literal center. */
  private def sqDistTo(center: Array[Long]): Column =
    aggregate(
      zip_with(col("q"), lit(center), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** q_kcenter: greedy k-center (Gonzalez 1985) coreset seeds — start
    * from the smallest vec_id, then `k`−1 times add the point FARTHEST
    * from its nearest already-chosen center (the 2-approximation to the
    * optimal k-center cover; the standard "pick a spread-out seed set"
    * selection). Output: (step, center_id, sel_dist) where sel_dist is
    * the point's min-squared-distance to the prior centers at the moment
    * it was chosen — the monotone-decreasing coverage radius.
    *
    * Scale shape: step t scans the corpus once with a codegen'd integer
    * expression against t literal centers (no join — the model rides in
    * the closure like a broadcast var) and pulls ONE row (`orderBy(md
    * desc, vec_id).limit(1)`, a distributed top-1, never a driver sort).
    * Total O(k²·d) expression work per row worst-case at k=8 — linear in
    * corpus size, and the driver holds k×dim longs. */
  def kCenter(spark: SparkSession, dir: String, k: Int = KCenterK): DataFrame = {
    val qe = Materialize(quantized(Tables.embeddings(spark, dir)))
    val first = qe.orderBy(col("vec_id")).limit(1).collect()(0)
    var centers = Vector(
      (first.getLong(0), first.getSeq[Long](1).toArray))
    val out = scala.collection.mutable.ArrayBuffer(
      (1, centers(0)._1, 0L))
    for (step <- 2 to k) {
      val md = centers.map(c => sqDistTo(c._2)).reduce(least(_, _))
      val top = qe.select(col("vec_id"), col("q"), md.as("md"))
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
      centers :+= ((top.getLong(0), top.getSeq[Long](1).toArray))
      out += ((step, top.getLong(0), top.getLong(2)))
    }
    import spark.implicits._
    out.toSeq.toDF("step", "center_id", "sel_dist").orderBy(col("step"))
  }

  /** q_mmr: maximal-marginal-relevance selection — rank a candidate pool
    * by relevance to a query (here the label-0 centroid: "give me diverse
    * examples of this topic"), then greedily pick `k` maximizing
    * 7·rel − 3·max-sim-to-already-picked (λ=0.7 as exact integer weights
    * 7/3 over a ×10 score scale, so the argmax is integer-exact). The
    * classic redundancy-penalized selection for eval-set construction and
    * retrieval re-ranking. Output: (rank, vec_id, mmr_score).
    *
    * Scale shape: relevance is one corpus scan against the broadcast
    * centroid literal; the pool is a distributed top-`poolSize` (orderBy
    * + limit); only the pool (32×dim longs) reaches the driver, where the
    * O(k·pool) greedy runs on exact integers. At 100 TB only the pool
    * stage grows — the greedy stays constant-size. */
  def mmrSelect(spark: SparkSession, dir: String, poolSize: Int = MmrPool,
      k: Int = MmrK): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val emb = Tables.embeddings(spark, dir)
    val qc: Array[Long] = emb.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(round(stableRound4(avg(col("x").cast("double"))) * 10000)
        .cast("long").as("m"))
      .orderBy(col("d")).collect().map(_.getLong(1))
    val rel = aggregate(
      zip_with(col("q"), lit(qc), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val pool = quantized(emb)
      .select(col("vec_id"), col("q"), rel.as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var selected = Vector.empty[(Long, Array[Long])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (rank <- 1 to k) {
      val best = pool.iterator
        .filter(p => !selected.exists(_._1 == p._1))
        .map { p =>
          val maxSim =
            if (selected.isEmpty) 0L
            else selected.map(s => dot(p._2, s._2)).max
          (p._1, p._2, MmrRelWeight * p._3 - MmrSimWeight * maxSim)
        }
        .reduceLeft((a, b) =>
          if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a)
      selected :+= ((best._1, best._2))
      out += ((rank, best._1, best._3))
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "vec_id", "mmr_score").orderBy(col("rank"))
  }
}
