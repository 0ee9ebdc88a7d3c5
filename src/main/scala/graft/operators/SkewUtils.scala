package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large-large joins on hot keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most skew at
  * runtime; explicit salting remains the tool when one key dominates so
  * heavily that even split partitions bottleneck, or when the join is
  * followed by an aggregation on the same key (AQE splits don't survive
  * that). Technique: spread the big side across `factor` sub-keys with a
  * deterministic per-row salt, replicate the small-side rows once per salt
  * value, join on (key, salt). Row multiplication is |right| × factor —
  * bounded and chosen by the caller.
  *
  * Measured (SCALE.md, round 4): on UNIFORM keys (6M-row lineitem ⋈ 20k
  * part + groupBy, local[32], medians of 3 warm runs) plain-join-with-AQE
  * runs 0.47 s vs 1.37 s salted — the factor-8 small-side replication and
  * fatter shuffle cost ~3× when no key dominates. Default to plain + AQE;
  * reach for [[saltedJoin]] only under the two conditions above.
  */
object SkewUtils {

  /** Deterministic pseudo-salt derived from stable row columns (no
    * rand(): results must be reproducible run to run). */
  private def salt(cols: Seq[Column], factor: Int): Column =
    pmod(hash(cols: _*), lit(factor))

  /** Inner equi-join of `big` and `small` on `key`, salted `factor` ways.
    * Semantically identical to `big.join(small, key)` — verified by test —
    * but the shuffle spreads each hot key over `factor` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, bigSaltSource: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      salt(bigSaltSource.map(big(_)), factor))
    val salts = small.sparkSession.range(factor)
      .select(col("id").cast("int").as("_salt"))
    val replicatedSmall = small.crossJoin(broadcast(salts))
    saltedBig.join(replicatedSmall,
      saltedBig(key) === replicatedSmall(key)
        && saltedBig("_salt") === replicatedSmall("_salt"))
      .drop(replicatedSmall(key))
      .drop(saltedBig("_salt")).drop(replicatedSmall("_salt"))
  }
}
