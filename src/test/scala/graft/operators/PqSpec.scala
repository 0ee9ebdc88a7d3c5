package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Recall and structural invariants for the product-quantization ANN
  * (q_pq_ann) — rows-only in the oracle, so this spec is its correctness
  * contract. */
class PqSpec extends SparkTestBase {

  private lazy val pq = PqOps.pqTopK(spark, sf).collect()

  test("pqTopK shape: dense ranks, no self-matches, cosine descending") {
    assert(pq.nonEmpty)
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(_.getLong(2) != q))
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sortBy(-(_: Double))))
    }
  }

  test("pqTopK recall@10 vs the exact cosine baseline") {
    val emb = graft.Tables.embeddings(spark, sf)
    val exact = SimilarityOps
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = pq.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // ADC shortlist of 50 + exact re-rank: on the clustered fixture
    // embeddings this recovers most of the exact top-10
    assert(mean >= 0.5, s"mean recall@10 = $mean (${recalls.toSeq})")
  }

  test("re-ranked cosines are exactly the true cosines for returned pairs") {
    val emb = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    pq.foreach { r =>
      val (q, c) = (emb(r.getLong(0)), emb(r.getLong(2)))
      val dot = q.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val cos = dot / (math.sqrt(q.map(x => x.toDouble * x).sum)
        * math.sqrt(c.map(x => x.toDouble * x).sum))
      assert(math.abs(r.getDouble(3) - cos) < 1e-3,
        s"cos mismatch at ${r.getLong(0)}->${r.getLong(2)}")
    }
  }

  test("ivfPqTopK: candidates respect the probed cells; ranks well-formed") {
    val out = PqOps.ivfPqTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // shape: dense ranks from 1, no self-matches, cosine desc per query
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length).toSeq)
      assert(rs.forall(_.getLong(2) != q))
      val coss = sorted.map(_.getDouble(3)).toSeq
      assert(coss.sliding(2).forall { case Seq(a, b) => b <= a })
    }
    // every returned candidate sits in one of its query's probed cells
    val emb = graft.Tables.embeddings(spark, sf)
    val (centroids, assigned) = IvfOps.trainIndex(emb)
    val cellOf = assigned.select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = IvfOps.probeCells(
        emb.filter(col("vec_id") < 5), centroids, 4)
      .select(col("q_id"), col("centroid_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getInt(1)).toSet }
    out.foreach { r =>
      assert(probed(r.getLong(0)).contains(cellOf(r.getLong(2))),
        s"cand ${r.getLong(2)} of q ${r.getLong(0)} outside probed cells")
    }
    // the composite is a restriction of PQ: every (q, cand) it returns
    // scores the same exact cosine as the full-ADC pq query would
    val full = PqOps.pqTopK(spark, sf, k = 50, shortlist = 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      full.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(c == r.getDouble(3), s"cos drift at $r")
      }
    }
  }

  test("knnGraph: per-query results are independent of the probe batch") {
    // the probes-as-data contract: a query's neighbors must not depend on
    // which OTHER probes share the batch — the full-corpus kNN graph
    // restricted to the first 5 queries equals the same IVF+PQ search run
    // with only those 5 probes
    val full = PqOps.knnGraph(spark, sf)
      .filter(col("q_id") < 5).collect().map(_.toString).toSeq
    val solo = PqOps.ivfPqTopK(spark, sf, k = 3, shortlist = 20,
      nProbes = Some(5)).collect().map(_.toString).toSeq
    assert(full == solo)
    assert(full.nonEmpty)
  }

  test("knnGraph shape: every vector gets k neighbors, no self-edges") {
    val g = PqOps.knnGraph(spark, sf).collect()
    val n = graft.Tables.embeddings(spark, sf).count()
    val byQ = g.groupBy(_.getLong(0))
    assert(byQ.size == n, s"${byQ.size} queries vs $n vectors")
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 3 && rows.forall(_.getLong(2) != q), s"q=$q")
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 3))
    }
  }

  test("knnComponents equals a driver union-find over the mutual-kNN edges") {
    val edges = PqOps.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val mutual = edges.filter { case (a, b) => a < b && edges((b, a)) }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r)
      parent.getOrElseUpdate(x, r); if (parent(x) != r) parent(x) = r; r
    }
    mutual.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val got = PqOps.knnComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == graft.Tables.embeddings(spark, sf).count())
    got.foreach { case (v, c) =>
      val expect = if (parent.contains(v)) find(v) else v
      assert(c == expect, s"vec $v: cluster $c vs $expect")
    }
    // the fixture must actually exercise merging, not just singletons
    assert(got.exists { case (v, c) => c != v })
  }

  test("search excludeSelfId: opt-out keeps a colliding corpus id as its own neighbor") {
    // corpus-probe uses exclude the probe's own vec_id (a vector is
    // trivially its own nearest neighbor); an EXTERNAL id namespace must
    // opt out, or an id collision silently costs a legitimate neighbor
    val index = PqOps.buildIndex(spark, sf)
    val probes = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 3)
    val withSelf = index.search(probes, excludeSelfId = false).collect()
    val without = index.search(probes).collect()
    // opt-out: each probe's rank-1 hit is itself at cosine 1.0
    withSelf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val r1 = rs.minBy(_.getInt(1))
      assert(r1.getLong(2) == q && r1.getDouble(3) == 1.0, s"q=$q r1=$r1")
    }
    // default: no self matches, and the two results agree off-diagonal
    assert(without.forall(r => r.getLong(0) != r.getLong(2)))
    val withoutSet = without.map(r => (r.getLong(0), r.getLong(2))).toSet
    val shifted = withSelf.filter(r => r.getLong(0) != r.getLong(2))
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // self occupies one of k slots, so the opt-out's non-self tail is a
    // subset of the default's top-k
    assert(shifted.subsetOf(withoutSet), s"${shifted -- withoutSet}")
  }

  test("knnRecall: audited recall is in (0, 1], every probe returns k rows") {
    val r = PqOps.knnRecall(spark, sf).collect()
    assert(r.length == 1)
    val (m, n, rec, ret) = (r(0).getString(0), r(0).getLong(1),
      r(0).getDouble(2), r(0).getDouble(3))
    assert(m == "ivfpq" && n == 50)
    assert(rec > 0.0 && rec <= 1.0, s"recall $rec")
    assert(ret == 3.0, s"avg returned $ret")
  }

  test("kCells plumb: composites at the explicit default equal the declared path; √V reaches the graph build") {
    // the r12 verdict's top ask: knnComponents/lof must be able to reach
    // the measured √V cell posture (SCALE.md: e=1.04 vs fixed16 e=2.09)
    // without hand-recomposing their internals. Default-equality first —
    // the declared queries and their oracles are untouched by the plumb.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(PqOps.knnComponents(spark, sf, kCells = IvfOps.DefaultK)) ==
      rows(PqOps.knnComponents(spark, sf)))
    assert(rows(PqOps.lof(spark, sf, kCells = IvfOps.DefaultK)) ==
      rows(PqOps.lof(spark, sf)))
    // and the dial genuinely reaches the coarse quantizer: at a √V cell
    // count the composites still produce a complete, well-formed answer
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    val sqrtK = math.ceil(math.sqrt(nVecs.toDouble)).toInt
    val comps = PqOps.knnComponents(spark, sf, kCells = sqrtK).collect()
    assert(comps.length == nVecs)
    assert(comps.map(_.getLong(0)).distinct.length == nVecs)
    val l = PqOps.lof(spark, sf, kCells = sqrtK).collect()
    assert(l.nonEmpty && l.forall(_.getDouble(2) > 0.0))
  }
}
