package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's codegen'd higher-order functions (no UDFs — stays inside
  * whole-stage codegen, SURVEY.md §7.3).
  *
  * All arithmetic is double-precision with a sequential left fold, which
  * matches DuckDB's `list_sum(list_transform(...))` evaluation order exactly
  * (empirically to <1e-16), so rounded cosine values hash-match the oracle.
  */
object VectorFunctions {

  /** Element-wise dot product in double precision (sequential fold).
    * Backed by the codegen'd [[graft.functions.expressions.VectorDotProduct]]
    * Catalyst expression — a tight primitive loop inside whole-stage codegen,
    * ~10× the interpreted `aggregate(zip_with(...))` formulation on pair
    * joins. Same fold order, so oracle values are unchanged. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(expressions.VectorDotProduct(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  /** L2 norm in double precision (codegen'd native expression). */
  def l2Norm(a: Column): Column =
    GraftColumnBridge.toColumn(expressions.VectorL2Norm(
      GraftColumnBridge.toExpression(a)))

  /** Linear-merge intersection of two SORTED, duplicate-free bigint arrays
    * (codegen'd [[expressions.SortedLongIntersect]] — no per-row hash set;
    * the triangle-counting hot path runs this once per edge). */
  def sortedIntersect(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(expressions.SortedLongIntersect(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  /** Element-wise mean of a fixed-dim vector column as one partial-friendly
    * aggregate (see [[expressions.VectorAverage]]). */
  def vectorAvg(a: Column, dim: Int): Column =
    GraftColumnBridge.toColumn(expressions.VectorAverage(
      GraftColumnBridge.toExpression(a), dim).toAggregateExpression())

  /** Cosine similarity given precomputed norms (precompute norms per side
    * before a pair join — O(n) instead of O(n²) norm work). */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Nearest-centroid cell id for a driver-held k-means model (codegen'd
    * argmin — the model rides as reference objects, so the generated source
    * is model-independent and compiles ONCE across Lloyd passes; see
    * [[expressions.NearestCentroid]]). */
  def nearestCentroid(vec: Column, cids: Array[Int],
      centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.toColumn(expressions.NearestCentroid(
      GraftColumnBridge.toExpression(vec), cids, centroids))

  /** Random-hyperplane LSH signature: the sign bit of the dot product with
    * `planes` fixed hyperplanes, packed into a long. Deterministic planes
    * come from [[hyperplanes]]. Used to bucket vectors so approximate
    * nearest-neighbor search only compares within a bucket — the 100 TB
    * scale path for similarity search (brute force is the small-scale
    * baseline). */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dotProduct(vec, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Deterministic pseudo-random Gaussian hyperplanes (fixed seed so query
    * results are reproducible across runs and JVMs). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
