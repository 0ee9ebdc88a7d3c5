package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class ClusterDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents labels chains and isolates separate components") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("src", "dst")
    val comps = DedupOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L).forall(comps(_) == 10L))
    assert(Seq(20L, 21L, 22L, 23L).forall(comps(_) == 20L))
  }

  test("connectedComponents converges on a 60-node chain (pointer jumping)") {
    val edges = (0L until 59L).map(i => (i, i + 1)).toDF("src", "dst")
    val comps = DedupOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 60)
    assert(comps.values.forall(_ == 0L))
  }

  test("distributed CC path equals the local union-find path") {
    // chains, a star, isolates-by-pair — force the label-propagation loop
    // (the size dispatch would otherwise route everything tiny to the
    // driver-local path) and require identical labeling
    val edges = ((0L until 59L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (200L, 201L)))
      .toDF("src", "dst")
    val dist = DedupOps.connectedComponents(edges, forceDistributed = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    val local = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    assert(dist == local)
  }

  test("dedupClusters collapses transitive near-dup chains") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val t0 = docs.filter(col("doc_id") === 0).select("text").as[String].head()
    val words = t0.split(" ").toVector
    // chain: doc0 ~ m1 (1 word changed) ~ m2 (2 words changed from doc0)
    val m1 = words.updated(1, "mutA").mkString(" ")
    val m2 = words.updated(1, "mutA").updated(4, "mutB").mkString(" ")
    val extra = Seq(
      (200000L, m1, "en", "syn", m1.length.toLong),
      (200001L, m2, "en", "syn", m2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = DedupOps.dedupClusters(docs.union(extra), 0.4)
      .filter(col("doc_id").isin(0L, 200000L, 200001L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all three collapse to the representative 0 through the chain
    assert(clusters(0L) == 0L)
    assert(clusters(200000L) == 0L)
    assert(clusters(200001L) == 0L)
  }

  test("dedupClusters covers every doc exactly once, reps are minimal") {
    val docs = Tables.documents(spark, sf)
    val out = DedupOps.dedupClusters(docs, 0.5)
    assert(out.count() == docs.count())
    assert(out.filter(col("cluster_id") > col("doc_id")).count() == 0)
  }

  /** Plain-Scala shingle set — independent of WordShingles / the Spark
    * join, so the equality below is a real differential, not the same
    * formula evaluated twice. */
  private def localShingles(text: String): Set[String] =
    text.trim.toLowerCase.split("\\s+").toSeq match {
      case toks if toks.length >= 3 =>
        toks.sliding(3).map(_.mkString(" ")).toSet
      case _ => Set.empty
    }

  test("shingleVerifiedPairs equals driver all-pairs exact Jaccard (recall 1, precision 1)") {
    val docs = Tables.documents(spark, sf)
    val thr = 0.5
    val got = DedupOps.shingleVerifiedPairs(docs, thr)
      .as[(Long, Long)].collect().toSet
    val sets = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> localShingles(t) }
    val want = (for {
      (ida, sa) <- sets.iterator
      (idb, sb) <- sets.iterator
      if ida < idb && sa.nonEmpty
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa.size + sb.size - inter) >= thr
    } yield (ida, idb)).toSet
    assert(want.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
    assert(got == want,
      s"missing: ${want.diff(got).take(5)}; extra: ${got.diff(want).take(5)}")
  }

  test("dedupClustersExact equals driver union-find over the exact edge set") {
    val docs = Tables.documents(spark, sf)
    val thr = 0.5
    val edges = DedupOps.shingleVerifiedPairs(docs, thr)
      .as[(Long, Long)].collect()
    val ids = docs.select("doc_id").as[Long].collect()
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).sorted.toSeq
    val got = DedupOps.dedupClustersExact(docs, thr)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("dedupClustersExact collapses transitive near-dup chains") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val t0 = docs.filter(col("doc_id") === 0).select("text").as[String].head()
    val words = t0.split(" ").toVector
    val m1 = words.updated(1, "mutA").mkString(" ")
    val m2 = words.updated(1, "mutA").updated(4, "mutB").mkString(" ")
    val extra = Seq(
      (200000L, m1, "en", "syn", m1.length.toLong),
      (200001L, m2, "en", "syn", m2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = DedupOps.dedupClustersExact(docs.union(extra), 0.4)
      .filter(col("doc_id").isin(0L, 200000L, 200001L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(0L) == 0L)
    assert(clusters(200000L) == 0L)
    assert(clusters(200001L) == 0L)
  }
}
