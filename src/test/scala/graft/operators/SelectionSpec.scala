package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Ground-truth tests for the data-selection operators (q_kcenter,
  * q_mmr): both are pinned to driver-local reference implementations of
  * the same greedy over the same integer-quantized vectors, so the
  * distributed argmax stages are checked against naive exact replays. */
class SelectionSpec extends SparkTestBase {

  private lazy val qvecs: Array[(Long, Array[Long])] =
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x =>
        round(graft.functions.NumericFunctions.stableRound4(
          x.cast("double")) * 10000).cast("long")).as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("kCenter matches the driver-local Gonzalez greedy") {
    val out = SelectionOps.kCenter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // reference greedy on the collected quantized vectors
    val byId = qvecs.sortBy(_._1)
    var centers = Vector(byId.head)
    val want = scala.collection.mutable.ArrayBuffer((1, byId.head._1, 0L))
    for (step <- 2 to SelectionOps.KCenterK) {
      val (id, q, md) = byId.iterator.map { case (id, q) =>
        (id, q, centers.map(c => sqDist(q, c._2)).min)
      }.reduceLeft((a, b) =>
        if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a)
      centers :+= ((id, q))
      want += ((step, id, md))
    }
    assert(out == want.toSeq, s"got $out want $want")
    // coverage radius is non-increasing from step 2 on
    val radii = out.drop(1).map(_._3)
    assert(radii.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(out.map(_._2).distinct.length == out.length, "centers distinct")
  }

  test("mmrSelect matches the driver-local greedy and penalizes redundancy") {
    val out = SelectionOps.mmrSelect(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1) == (1 to SelectionOps.MmrK).toSeq)
    assert(out.map(_._2).distinct.length == out.length, "picks distinct")
    // reference: same centroid, pool, and greedy on collected vectors
    val emb = graft.Tables.embeddings(spark, sf)
    val qc = emb.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(round(graft.functions.NumericFunctions.stableRound4(
        avg(col("x").cast("double"))) * 10000).cast("long").as("m"))
      .orderBy(col("d")).collect().map(_.getLong(1))
    val pool = qvecs.map { case (id, q) => (id, q, dot(q, qc)) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(SelectionOps.MmrPool)
    var selected = Vector.empty[(Long, Array[Long])]
    val want = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (rank <- 1 to SelectionOps.MmrK) {
      val best = pool.iterator
        .filter(p => !selected.exists(_._1 == p._1))
        .map { p =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(s => dot(p._2, s._2)).max
          (p._1, p._2,
            SelectionOps.MmrRelWeight * p._3 - SelectionOps.MmrSimWeight * ms)
        }
        .reduceLeft((a, b) =>
          if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a)
      selected :+= ((best._1, best._2))
      want += ((rank, best._1, best._3))
    }
    assert(out == want.toSeq, s"got $out want $want")
    // rank 1 is the pure-relevance argmax (no redundancy term yet)
    assert(out.head._2 == pool.head._1)
  }
}
