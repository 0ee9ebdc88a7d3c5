package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles with BOUNDED aggregation state — the
  * round-15 replacement for `percentile()` in the declared exact-percentile
  * queries (q_winsorize, q_mad_outlier, q_stats_agg, q_theil_sen).
  *
  * `percentile(col, p)` is a single `TypedImperativeAggregate` whose state
  * holds EVERY value of the group — O(n) executor memory and a
  * single-threaded final sort; the round-14 honest action measured the
  * collect at 7.4 s / 6 M rows at sf1, and it is the one operator family
  * that cannot run as declared at 100 TB. This computes the bit-identical
  * result with the classic two-pass bracketed selection:
  *
  *   1. ONE aggregation pass: per group, `count` + `min`/`max` + a single
  *      mergeable `approx_percentile` sketch evaluated at p ± margins
  *      (bounded state, partial-aggregated — the sketch the `_sketch`
  *      primaries already ship).
  *   2. ONE counting pass per bracket attempt: per group, the exact number
  *      of rows BELOW the bracket plus a (value → count) histogram of the
  *      rows INSIDE it. The bracket spans rank p·n ± 4n/accuracy, so the
  *      histogram is O(n/accuracy) rows — a driver pull in the same
  *      bounded-model-state class as the k-means centroid collects.
  *   3. Driver-side exact selection + interpolation replicating
  *      `PercentileBase.getPercentile` BIT-FOR-BIT (verified against the
  *      disassembled Spark 4.1.2 bytecode, and pinned by
  *      ExactPercentileSpec + the unchanged DuckDB oracle hashes):
  *      position = p·(n−1); lower = ⌊position⌋; higher = ⌈position⌉;
  *      the values at 0-based ranks lower/higher in the sorted multiset;
  *      lowerV if higher == lower or lowerV == higherV, else
  *      (higher − position)·lowerV + (position − lower)·higherV.
  *
  * If a bracket misses its rank (the sketch's guarantee failed — not
  * observed, but the code must be total), the pass-2 attempt retries with
  * the 4×-wider sketch values already computed in pass 1, then with the
  * group's [min, max]. Deterministic: the final selection depends only on
  * the data, never on which bracket found it.
  *
  * Restriction: the value column must cast to DOUBLE order-isomorphically
  * (doubles, or decimals that are exact in double — both table families
  * here qualify); NULLs are ignored exactly as `percentile` ignores them.
  */
object ExactPercentile {

  /** Exact percentiles of `valueCol` at `ps` per distinct `groupCols` key.
    * Returns group key (as a Seq in `groupCols` order) → values aligned
    * with `ps`. Empty `groupCols` → single key `Seq()` (global). Groups
    * with zero non-null rows are absent (as `percentile` returns NULL). */
  def compute(df0: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): Map[Seq[Any], Array[Double]] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentages must be in [0,1]: $ps")
    val gs = groupCols.map(col)
    val v = col("__v")
    val df = df0
      .select((gs :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(v.isNotNull)

    // pass 1: n, min, max, and bracket candidates at two widths per p
    val margins = Seq(4.0 / accuracy, 16.0 / accuracy)
    val pcts: Seq[Double] = ps.flatMap(p => margins.flatMap(m =>
      Seq(math.max(0.0, p - m), math.min(1.0, p + m))))
    val pctsSql = pcts.mkString("array(", ",", ")")
    val aggd = (if (gs.isEmpty) df.groupBy() else df.groupBy(gs: _*))
      .agg(count(v).as("__n"), min(v).as("__mn"), max(v).as("__mx"),
        expr(s"approx_percentile(__v, $pctsSql, $accuracy)").as("__apx"))
      .collect()
    val nG = groupCols.size
    // group key → (n, per-attempt brackets per p)
    val groups: Seq[(Seq[Any], Long, Array[Array[(Double, Double)]])] =
      aggd.toSeq.filter(_.getLong(nG) > 0L).map { r =>
        val key = (0 until nG).map(r.get)
        val n = r.getLong(nG)
        val mn = r.getDouble(nG + 1)
        val mx = r.getDouble(nG + 2)
        val apx = r.getSeq[Double](nG + 3)
        // attempts per p: [p±4/acc], [p±16/acc], [min, max]
        val brackets = ps.indices.map { i =>
          Array((apx(4 * i), apx(4 * i + 1)),
            (apx(4 * i + 2), apx(4 * i + 3)), (mn, mx))
        }.toArray
        (key, n, brackets)
      }

    // resolved results; pending (group, pIdx) start at attempt 0
    val resolved = scala.collection.mutable.Map[(Seq[Any], Int), Double]()
    var pending: Seq[(Seq[Any], Int)] =
      groups.flatMap { case (key, _, _) => ps.indices.map(i => (key, i)) }
    val nOf = groups.map { case (key, n, _) => key -> n }.toMap
    val brOf = groups.map { case (key, _, b) => key -> b }.toMap

    var attempt = 0
    while (pending.nonEmpty && attempt < margins.size + 1) {
      // bracket frame for this attempt: (group..., __pi, __lo, __hi)
      val spark = df0.sparkSession
      val bRows = pending.map { case (key, pi) =>
        val (lo, hi) = brOf(key)(pi)(attempt)
        Row.fromSeq(key ++ Seq[Any](pi, lo, hi))
      }
      val bSchema = org.apache.spark.sql.types.StructType(
        groupCols.map(c => df0.schema(c))
          ++ Seq(
            org.apache.spark.sql.types.StructField("__pi",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("__lo",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("__hi",
              org.apache.spark.sql.types.DoubleType)))
      val bdf = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(bRows, 1), bSchema))
      val joined =
        if (gs.isEmpty) df.crossJoin(bdf)
        else df.join(bdf, groupCols)
      // pass 2: tag = below/inside/above bracket; histogram inside only
      val tagged = joined
        .select((gs :+ col("__pi")
          :+ when(v < col("__lo"), lit(-1))
            .when(v > col("__hi"), lit(1)).otherwise(lit(0)).as("__tag")
          :+ when(v.between(col("__lo"), col("__hi")), v).as("__wv")): _*)
        .groupBy((gs :+ col("__pi") :+ col("__tag") :+ col("__wv")): _*)
        .agg(count(lit(1)).as("__c"))
        .collect()
      // per (group, pi): rows below + sorted in-window histogram
      val byKey = tagged.groupBy(r =>
        ((0 until nG).map(r.get): Seq[Any], r.getInt(nG)))
      val stillPending = scala.collection.mutable.ArrayBuffer[(Seq[Any], Int)]()
      pending.foreach { case (key, pi) =>
        val rows = byKey.getOrElse((key, pi), Array.empty[Row])
        val below = rows.filter(_.getInt(nG + 1) == -1).map(_.getLong(nG + 3)).sum
        val hist = rows.filter(_.getInt(nG + 1) == 0)
          .map(r => (r.getDouble(nG + 2), r.getLong(nG + 3)))
          .sortBy(_._1)
        val inWin = hist.map(_._2).sum
        val n = nOf(key)
        val position = ps(pi) * (n - 1)
        val lower = math.floor(position).toLong
        val higher = math.ceil(position).toLong
        if (lower >= below && higher < below + inWin) {
          def valueAtRank(rank: Long): Double = {
            var cum = below
            var res = Double.NaN
            var i = 0
            while (i < hist.length && cum <= rank) {
              if (rank < cum + hist(i)._2) { res = hist(i)._1; cum = rank + 1 }
              cum += hist(i)._2
              i += 1
            }
            res
          }
          val lowerV = valueAtRank(lower)
          resolved((key, pi)) =
            if (higher == lower) lowerV
            else {
              val higherV = valueAtRank(higher)
              if (higherV == lowerV) lowerV
              else (higher - position) * lowerV + (position - lower) * higherV
            }
        } else stillPending += ((key, pi))
      }
      pending = stillPending.toSeq
      attempt += 1
    }
    require(pending.isEmpty,
      s"exact-percentile bracket never covered ranks for: $pending")
    groups.map { case (key, _, _) =>
      key -> ps.indices.map(i => resolved((key, i))).toArray
    }.toMap
  }

  /** [[compute]] for a global (ungrouped) percentile set. */
  def computeGlobal(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): Array[Double] =
    compute(df, Nil, valueCol, ps, accuracy)(Seq())
}
