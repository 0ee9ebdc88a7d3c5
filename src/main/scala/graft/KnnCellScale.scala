package graft

import org.apache.spark.sql.functions._

/** Dev gate: the √|V|-cell posture of the full-corpus kNN graph,
  * MEASURED (round 12 — the r11 verdict's top ask; results in SCALE.md).
  *
  * The declared q_knn_graph pins k_cells = 16 so its unrolled-Lloyd
  * oracle stays replayable; at FIXED cells a full-corpus graph scans
  * |V| probes × |V|·nprobe/k_cells candidates — Θ(|V|²), e → 2. The
  * production dial is k_cells ∝ √|V| (FAISS's recipe): per-probe
  * candidates are |V|·nprobe/√|V| = nprobe·√|V|, total work Θ(|V|^1.5),
  * e → 1.5, at the cost of a larger coarse-quantizer training pass and
  * (for a fixed nprobe) a thinner probed fraction — which is why each
  * measurement here carries its measured recall@k next to the wall time.
  *
  * Grid: scales 10× / 30× / 100× of the sf0.1 embeddings (20k / 60k /
  * 200k vectors; copies are offset-shifted exactly like ScaleSpot so no
  * artificial exact-dup ties), postures k_cells = 16 vs ⌈√|V|⌉.
  * The fixed-16 posture is measured at 10× and 30× ONLY: at 100× its
  * ADC join materializes |V|²·nprobe/16 = 10¹⁰ candidate rows (hours on
  * this box) — the measured 10×→30× exponent plus that refusal IS the
  * quadratic story; the √V posture runs the full decade to 200k.
  *
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.KnnCellScale"        # reuse data
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.KnnCellScale regen"  # re-synthesize
  */
object KnnCellScale {
  val Scales = Seq(10, 30, 100)

  def outDir(copies: Int) = s"/tmp/graft_knncells_${copies}x"

  /** Embeddings-only synthesis (knnGraph/knnRecall read nothing else):
    * the ScaleSpot per-copy offset scheme — vec_ids shift by 10⁶·copy,
    * values by 0.001·copy, so candidate buckets grow realistically. */
  private def synthesize(spark: org.apache.spark.sql.SparkSession,
      src: String, copies: Int): Unit = {
    (0 until copies).map { i =>
      val emb =
        if (i == 0) col("embedding")
        else expr(s"transform(embedding, x -> x + cast(${i * 0.001} as float))")
      Tables.embeddings(spark, src)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
        .withColumn("embedding", emb)
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"${outDir(copies)}/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("SPARK_SPOT_PARTITIONS", "128").toInt
    val spark = GraftSession.builder("graft-knncell-scale",
      shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    Scales.foreach { c =>
      if (args.contains("regen") ||
          !new java.io.File(s"${outDir(c)}/embeddings.parquet").exists()) {
        println(s"synthesizing ${c}x embeddings ...")
        synthesize(spark, src, c)
      }
    }

    // warm: compile the plan shapes once at tiny SF
    graft.operators.PqOps.knnGraph(spark, "/root/testdata/sf0.01").count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // `semdedup` mode (r13 verdict ask #5): price SemDeDup's cell dial
    // DIRECTLY instead of by construction-equivalence to the kNN curve.
    // Same synthesized decade, postures √n vs fixed-16 clusters; the
    // within-cell pair join is the measured stage (Θ(n²/k) candidates →
    // Θ(n^1.5) at k=√n, Θ(n²) at fixed k). Output rows ≡ n (every vector
    // gets a keep verdict) — asserted, so a silently truncated join
    // can't read as a win.
    if (args.contains("semdedup")) {
      // warm via FullExec so the SAME physical plan that is timed gets
      // codegen-compiled/JITed — a bare count() re-optimizes with the
      // survivor/pair joins eliminated (this file's own vacuity finding),
      // leaving rep 1 to pay compile cost (round-15 advisor fix)
      FullExec.count(
        graft.operators.DedupOps.semDedupQuery(spark, "/root/testdata/sf0.01"))
      final case class Sp(scale: Int, posture: String, k: Int, n: Long,
          warm: Double)
      val sp = scala.collection.mutable.ArrayBuffer[Sp]()
      Scales.foreach { c =>
        val dir = outDir(c)
        val emb = Tables.embeddings(spark, dir)
        val nVecs = emb.count()
        val sqrtK = math.ceil(math.sqrt(nVecs.toDouble)).toInt
        val postures = Seq("sqrtN" -> sqrtK) ++
          (if (c < 100 || args.contains("full16")) Seq("fixed16" -> 16)
           else Nil)
        postures.foreach { case (posture, k) =>
          // FullExec, NOT count(): a bare count lets the optimizer
          // ELIMINATE the survivor left join against the unique-keyed
          // dup aggregate and skip the pair join entirely (measured:
          // count() reads 0.9 s at 100x where the real plan pays the
          // 1.4e9-pair cost) — the finding that triggered the round-14
          // action change across every timing harness
          def run() = timed(FullExec.count(graft.operators.DedupOps
            .semDedup(Tables.embeddings(spark, dir), numClusters = k)))
          val (t1, n1) = run(); val (t2, n2) = run()
          require(n1 == n2, s"nondeterministic at ${c}x/$posture: $n1 $n2")
          require(n1 == nVecs,
            s"incomplete verdicts at ${c}x/$posture: $n1 vs $nVecs")
          println(f"${c}%3dx n=$nVecs%7d semdedup/$posture%-8s k=$k%4d " +
            f"run1 $t1%8.2f s  run2 $t2%8.2f s")
          sp += Sp(c, posture, k, nVecs, math.min(t1, t2))
        }
      }
      println("\n== semdedup exponents e = log(tB/tA) / log(B/A), warm ==")
      def sexp(posture: String, a: Int, b: Int): Unit =
        for {
          pa <- sp.find(p => p.posture == posture && p.scale == a)
          pb <- sp.find(p => p.posture == posture && p.scale == b)
        } println(f"$posture%-8s ${a}x->${b}x  t ${pa.warm}%8.2f -> " +
          f"${pb.warm}%8.2f s" +
          f"  e ${math.log(pb.warm / pa.warm) / math.log(b.toDouble / a)}%5.2f")
      sexp("fixed16", 10, 30); sexp("fixed16", 30, 100)
      sexp("sqrtN", 10, 30); sexp("sqrtN", 30, 100); sexp("sqrtN", 10, 100)
      spark.stop(); return
    }

    final case class Pt(scale: Int, posture: String, kCells: Int,
        nVecs: Long, warm: Double, recall: Double)
    val pts = scala.collection.mutable.ArrayBuffer[Pt]()
    val compPts = scala.collection.mutable.ArrayBuffer[Pt]()

    Scales.foreach { c =>
      val dir = outDir(c)
      val nVecs = Tables.embeddings(spark, dir).count()
      val sqrtK = math.ceil(math.sqrt(nVecs.toDouble)).toInt
      // "sqrtv" arg: re-measure only the √V postures (+ the composite) —
      // the fixed16 quadratic is a settled r12 measurement (e = 2.09,
      // SCALE.md) and costs ~25 min to reconfirm; don't pay it when the
      // question is the composite's inheritance of the √V slope
      val postures = Seq("sqrtV" -> sqrtK) ++
        (if (c < 100 && !args.contains("sqrtv")) Seq("fixed16" -> 16)
         else Nil)
      postures.foreach { case (posture, kc) =>
        val (t1, n1) = timed(FullExec.count(
          graft.operators.PqOps.knnGraph(spark, dir, kCells = kc)))
        val (t2, n2) = timed(FullExec.count(
          graft.operators.PqOps.knnGraph(spark, dir, kCells = kc)))
        require(n1 == n2, s"nondeterministic at ${c}x/$posture: $n1 vs $n2")
        val rec = graft.operators.PqOps.knnRecall(spark, dir, kCells = kc)
          .head().getDouble(2)
        println(f"${c}%3dx |V|=$nVecs%7d $posture%-8s k_cells=$kc%4d " +
          f"run1 $t1%8.2f s  run2 $t2%8.2f s  recall@3 $rec%.4f  ($n1%9d rows)")
        pts += Pt(c, posture, kc, nVecs, math.min(t1, t2), rec)
        // r12 verdict top ask follow-through: the COMPOSITE must inherit
        // the graph's posture now that kCells is plumbed — the mutualize
        // + components stages are Θ(k·|V|) on top of the build
        if (posture == "sqrtV") {
          val (c1, m1) = timed(FullExec.count(graft.operators.PqOps
            .knnComponents(spark, dir, kCells = kc)))
          val (c2, m2) = timed(FullExec.count(graft.operators.PqOps
            .knnComponents(spark, dir, kCells = kc)))
          require(m1 == m2, s"nondeterministic comps at ${c}x: $m1 vs $m2")
          require(m1 == nVecs, s"incomplete labeling at ${c}x: $m1 vs $nVecs")
          println(f"${c}%3dx |V|=$nVecs%7d comps√V  k_cells=$kc%4d " +
            f"run1 $c1%8.2f s  run2 $c2%8.2f s  ($m1%9d rows)")
          compPts += Pt(c, "comps", kc, nVecs, math.min(c1, c2), 1.0)
        }
      }
    }

    println("\n== scaling exponents e = log(tB/tA) / log(B/A), warm ==")
    def exp(posture: String, a: Int, b: Int): Unit =
      for {
        pa <- pts.find(p => p.posture == posture && p.scale == a)
        pb <- pts.find(p => p.posture == posture && p.scale == b)
      } println(f"$posture%-8s ${a}x->${b}x  t ${pa.warm}%8.2f -> ${pb.warm}%8.2f s" +
        f"  e ${math.log(pb.warm / pa.warm) / math.log(b.toDouble / a)}%5.2f" +
        f"  recall ${pa.recall}%.4f -> ${pb.recall}%.4f")
    exp("fixed16", 10, 30)
    exp("sqrtV", 10, 30)
    exp("sqrtV", 30, 100)
    exp("sqrtV", 10, 100)
    def cexp(a: Int, b: Int): Unit =
      for {
        pa <- compPts.find(_.scale == a)
        pb <- compPts.find(_.scale == b)
      } println(f"comps√V  ${a}x->${b}x  t ${pa.warm}%8.2f -> ${pb.warm}%8.2f s" +
        f"  e ${math.log(pb.warm / pa.warm) / math.log(b.toDouble / a)}%5.2f")
    cexp(10, 30)
    cexp(30, 100)
    cexp(10, 100)
    spark.stop()
  }
}
