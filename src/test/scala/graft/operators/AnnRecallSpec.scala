package graft.operators

import graft.SparkTestBase

/** Pins for q_ann_recall (rows-only: LSH/IVF shortlists have no SQL
  * oracle). The recall numbers themselves are definitional — computed by
  * joining each index's shortlist against the exact baseline — so the
  * tests pin structure, bounds, an independent hand-join recomputation,
  * and determinism. */
class AnnRecallSpec extends SparkTestBase {

  private lazy val out = SimilarityOps.annRecall(spark, sf).collect()

  test("annRecall: one row per method, recall and returned within bounds") {
    assert(out.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    out.foreach { r =>
      val (n, recall, ret) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n == 50L, s"expected 50 probes, got $n")
      assert(recall > 0.0 && recall <= 1.0, s"recall out of range: $recall")
      assert(ret > 0.0 && ret <= 10.0, s"avg_returned out of range: $ret")
      // an index cannot recall more of the exact top-10 than it returned
      assert(recall * 10.0 <= ret + 1e-9, s"recall $recall > returned $ret")
    }
  }

  test("annRecall: lsh row matches a hand-joined recomputation") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
    val probes = emb.filter(col("vec_id") < 50)
    val exact = SimilarityOps.bruteForceTopK(probes, emb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilarityOps.annTopK(probes, emb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val hits = lsh.count(exact.contains)
    val nProbes = exact.map(_._1).size
    val expRecall = math.round(hits.toDouble / (nProbes * 10) * 1e4) / 1e4
    val expRet = math.round(lsh.length.toDouble / nProbes * 1e4) / 1e4
    val row = out.find(_.getString(0) == "lsh").get
    assert(row.getDouble(2) == expRecall, s"recall ${row.getDouble(2)} != $expRecall")
    assert(row.getDouble(3) == expRet, s"avg_returned ${row.getDouble(3)} != $expRet")
  }

  test("annRecall is deterministic across runs") {
    val again = SimilarityOps.annRecall(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }
}
