package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class IvfSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val centroids = IvfOps.trainCentroids(emb, k = 16, iters = 3)

  test("training yields k centroids of the embedding dimension") {
    val rows = centroids.collect()
    assert(rows.length == 16)
    rows.foreach(r => assert(r.getSeq[Double](1).length == 64))
  }

  test("assignment is a true L2 argmin (verified on a sample)") {
    val cents = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = emb.filter(col("vec_id") < 20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = IvfOps.assign(emb.filter(col("vec_id") < 20), centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val best = cents.minBy { case (cid, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }._1
      assert(got(id) == best, s"vec $id assigned ${got(id)}, argmin $best")
    }
  }

  test("nearest-centroid interpreted eval matches codegen; bad dim fails loudly") {
    val small = emb.filter(col("vec_id") < 50)
    val viaCodegen = IvfOps.assign(small, centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val factoryKey = "spark.sql.codegen.factoryMode"
    val wholeKey = "spark.sql.codegen.wholeStage"
    val (f0, w0) = (spark.conf.get(factoryKey), spark.conf.get(wholeKey))
    try {
      spark.conf.set(factoryKey, "NO_CODEGEN")
      spark.conf.set(wholeKey, "false")
      val viaInterp = IvfOps.assign(small, centroids)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(viaInterp == viaCodegen)
    } finally {
      spark.conf.set(factoryKey, f0)
      spark.conf.set(wholeKey, w0)
    }
    val e = intercept[Exception] {
      IvfOps.assign(small.select(col("vec_id"),
        slice(col("embedding"), 1, 7).as("embedding")), centroids).collect()
    }
    assert(e.getMessage.contains("dimension mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("IVF search: cosines exact for returned pairs; reasonable recall") {
    val ivf = IvfOps.simIvf(spark, sf)
      .select("q_id", "cand_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = SimilarityOps.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, 10)
      .select("q_id", "cand_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // cosine values of returned pairs must equal the exact computation
    val exactAll = SimilarityOps.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, Int.MaxValue)
      .select("q_id", "cand_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (pair, c) => assert(exactAll(pair) == c) }
    // recall@10 over the 5 probes: IVF with 4/16 probes should find a
    // meaningful share of the true top-10 (deterministic given fixed init)
    val hits = exact.keySet.count(ivf.contains)
    assert(hits >= 15, s"recall too low: $hits/50")
  }

  test("ivfBalance cells partition the corpus; factors consistent") {
    val n = graft.Tables.embeddings(spark, sf).count()
    val rows = IvfOps.ivfBalance(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == n) // cells partition the vectors
    assert(rows.length <= 16)
    val nonEmpty = rows.length.toDouble
    val maxCell = rows.map(_.getLong(1)).max.toDouble
    val factor = BigDecimal(maxCell / (n / nonEmpty))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(r.getDouble(3) == factor, s"imbalance ${r.getDouble(3)} != $factor")
      assert(r.getLong(4) == 16L - rows.length)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // determinism: a second build yields the identical report
    val again = IvfOps.ivfBalance(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("clusterPurity: containment, ALL-row arithmetic, determinism") {
    val n = graft.Tables.embeddings(spark, sf).count()
    val rows = IvfOps.clusterPurity(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    val (all, cells) = rows.partition(_._1 == -1)
    assert(all.length == 1 && cells.nonEmpty)
    assert(cells.map(_._2).sum == n) // cells partition the vectors
    cells.foreach { case (_, nv, top, nTop, purity) =>
      assert(nTop >= 1 && nTop <= nv)
      assert(top >= 0) // real label, not the ALL sentinel
      assert(purity > 0.0 && purity <= 1.0)
      assert(math.abs(purity - BigDecimal(nTop.toDouble / nv)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // ALL row aggregates the per-cell majorities
    val (_, allN, _, allTop, allPurity) = all.head
    assert(allN == n && allTop == cells.map(_._4).sum)
    assert(math.abs(allPurity - BigDecimal(allTop.toDouble / allN)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // determinism: a second build yields the identical report
    val again = IvfOps.clusterPurity(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
