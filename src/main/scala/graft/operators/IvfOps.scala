package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest-neighbor index — the coarse-
  * quantizer scale path for similarity search (the alternative to the
  * hyperplane-LSH buckets in SimilarityOps; cf. Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", 2011, whose IVF coarse stage
  * this follows without the PQ refinement).
  *
  * Training is Lloyd's k-means expressed as DataFrame ops: assignment is a
  * broadcast join against the (tiny) centroid set, update is one
  * hash-aggregation — both scale linearly and shuffle only (vec → centroid)
  * assignments, never vector pairs. Initialization is deterministic (first
  * `k` vectors by id), so the whole index build is reproducible.
  *
  * Search probes the `nprobe` nearest cells per query: candidates come from
  * an equality join on the cell id — same join shape as LSH, but cells adapt
  * to the data distribution, which keeps recall stable on clustered
  * embeddings where fixed hyperplanes fragment clusters.
  */
object IvfOps {

  /** Centroids with their precomputed squared norm (k rows, computed once —
    * not once per vector-centroid pair). */
  private def withCentroidNorm(centroids: DataFrame): DataFrame =
    centroids.withColumn("cnrm2",
      dotProduct(col("centroid"), col("centroid")))

  /** Argmin score for "nearest centroid by L2": |b|²−2⟨a,b⟩. The |a|² term
    * is constant per input vector, so dropping it preserves the argmin and
    * leaves the codegen'd dot product as the only per-pair O(dim) work. */
  private def centroidScore: org.apache.spark.sql.Column =
    col("cnrm2") - lit(2.0) * dotProduct(col("embedding"), col("centroid"))

  /** One assignment pass: nearest centroid (L2) per vector. `centroids` is
    * broadcast — it is k rows. Uses min(struct(score, cid)) for a
    * deterministic argmin (ties break to the lower cid). The embedding is
    * carried through the aggregate (any_value over identical copies), so
    * callers needing (vec_id, cell, vector) don't re-join — and re-scan —
    * the embedding table after every pass. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = emb.crossJoin(broadcast(withCentroidNorm(centroids)))
      .withColumn("score", centroidScore)
    joined.groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("centroid_id"))).as("best"),
        any_value(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
        col("embedding"))
  }

  /** Deterministic init: the first `k` vectors by id become the seed
    * centroids. The row-numbering window runs over exactly `k` rows
    * (post-limit); its partition key isnull(vec_id) is constant-valued but
    * NOT constant-foldable, so EliminateWindowPartitions can't strip it —
    * avoiding the empty-partition-spec WindowExec shape (and its
    * "moving all data to a single partition" warning) at no cost. */
  private def initCentroids(emb: DataFrame, k: Int): DataFrame =
    emb.orderBy(col("vec_id")).limit(k)
      .withColumn("centroid_id",
        row_number().over(
          Window.partitionBy(isnull(col("vec_id")))
            .orderBy(col("vec_id"))) - 1)
      .select(col("centroid_id"),
        transform(col("embedding"), _.cast("double")).as("centroid"))

  /** `rounds` Lloyd assign+update iterations from `init`. */
  private def lloyd(emb: DataFrame, init: DataFrame, dim: Int,
      rounds: Int): DataFrame =
    (1 to rounds).foldLeft(init) { (centroids, _) =>
      val assigned = assign(emb, centroids)
      // centroid update = element-wise mean per cell via the custom
      // VectorAverage aggregate: ONE groupBy whose shuffle carries one
      // partial buffer per cell — not a posexplode (×dim rows) through two
      // groupBys
      val next = assigned
        .groupBy(col("centroid_id"))
        .agg(vectorAvg(col("embedding"), dim).as("centroid"))
      // keep empty cells at their previous position
      centroids.as("old").join(next.as("new"), Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new.centroid"), col("old.centroid")).as("centroid"))
        .localCheckpoint(eager = true) // truncate the iterative lineage
    }

  /** Train `k` centroids with `iters` Lloyd iterations. Returns
    * (centroid_id, centroid: array<double>). */
  def trainCentroids(emb: DataFrame, k: Int = 16, iters: Int = 5): DataFrame = {
    // dimension comes from the data (one-row probe), keeping the API
    // dimension-agnostic; VectorAverage needs it up front for its buffer
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    lloyd(emb, initCentroids(emb, k), dim, iters)
  }

  /** Train the full IVF index: `iters` assignment passes over the corpus —
    * `iters − 1` Lloyd updates, then ONE final assignment under the
    * returned centroids. That final assignment IS the inverted list:
    * it was computed under exactly the centroids search will probe with,
    * so cell selection and list membership share one geometry, and search
    * needs no re-assignment pass of its own (the round-3 shape ran
    * `iters` training assigns PLUS a full re-assign inside search — one
    * redundant scan+broadcast-argmin over the whole corpus). */
  def trainIndex(emb: DataFrame, k: Int = 16, iters: Int = 3)
      : (DataFrame, DataFrame) = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val centroids = lloyd(emb, initCentroids(emb, k), dim, iters - 1)
    (centroids, assign(emb, centroids))
  }

  /** IVF search against a fresh assignment pass. Prefer
    * [[searchAssigned]] with [[trainIndex]]'s inverted list — this variant
    * re-scans the corpus to rebuild it. */
  def search(queries: DataFrame, emb: DataFrame, centroids: DataFrame,
      nprobe: Int = 4, k: Int = 10): DataFrame =
    searchAssigned(queries, assign(emb, centroids), centroids, nprobe, k)

  /** IVF search: for each query, probe the `nprobe` nearest cells and rank
    * the candidates in those cells by cosine. `assigned` is the inverted
    * list — (vec_id, centroid_id, embedding) as produced by [[assign]] /
    * [[trainIndex]]. */
  def searchAssigned(queries: DataFrame, assigned: DataFrame,
      centroids: DataFrame, nprobe: Int = 4, k: Int = 10): DataFrame = {
    val candidates = assigned
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"), col("centroid_id"))

    val probeW = Window.partitionBy(col("vec_id")).orderBy(col("score"), col("centroid_id"))
    val probes = queries.crossJoin(broadcast(withCentroidNorm(centroids)))
      .withColumn("score", centroidScore)
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2Norm(col("embedding")).as("q_nrm"), col("centroid_id"))

    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    probes.join(candidates, Seq("centroid_id"))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        round(cosine(dotProduct(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("cand_id"), col("cos_sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Declared query: IVF top-10 for probe vectors vec_id < 5 (rows-only —
    * the iterative training isn't SQL-expressible; ScalaTest checks recall
    * against the exact baseline and cosine agreement). */
  def simIvf(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: k-means reads the vectors every iteration, then
    // the final index assignment and the probe side read them again —
    // without this the parquet scan + float→double transforms re-execute
    // per pass
    val emb = Materialize(Tables.embeddings(spark, dir))
    val (centroids, assigned) = trainIndex(emb, k = 16, iters = 3)
    searchAssigned(emb.filter(col("vec_id") < 5), assigned, centroids)
  }
}
