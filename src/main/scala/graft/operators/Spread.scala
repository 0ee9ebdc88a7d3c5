package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out of a narrow-partitioned frame BEFORE expensive
  * per-row work (tokenization, row-multiplying explodes, hash probes).
  *
  * Small parquet inputs read as 1–3 scan splits (128 MB split size over
  * KB–MB files), so everything whole-stage-fused above the first exchange
  * runs on ≤3 tasks however many cores the session has — per-row-heavy
  * pipelines then cannot use the machine (guide §2.5 "input skew: one
  * huge unsplittable file… repartition immediately after the read").
  * This is an IDENTITY when the input already has at least the session's
  * default parallelism (a 100 TB scan has thousands of splits — no extra
  * exchange is ever added at scale), so it is not a local-core-count
  * constant: the dial is the session's own parallelism at any scale.
  *
  * Round-robin repartition is deterministic under Spark's
  * sort-before-repartition default (retried tasks reproduce the same
  * row-to-partition assignment). Callers must still be partition-order
  * free in their float aggregates — every caller here already is (the
  * declared queries' aggregation results are exact-integer or
  * stableRound4-barriered, the same invariant any shuffle implies).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
