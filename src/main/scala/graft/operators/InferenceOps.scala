package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.NumericFunctions.stableRound4

/** Corpus-screening inference: the multiple-testing and
  * estimation-certificate layer a curation pipeline runs when it screens
  * MANY slices at once — per-source drift tests corrected for the family
  * size (Benjamini–Hochberg), a parametric length-distribution fit
  * (lognormal, the standard web-document length model), and
  * distribution-free sample-size certificates (Hoeffding) for every
  * per-source rate estimate the dashboards report.
  *
  * Scale posture: everything runs on the \|sources\|-bounded rollup of
  * exact integer count/sum/power-sum moments (wide power sums ride
  * DECIMAL(38,0), the [[StatOps.grubbs]] overflow rule) — corpus rows
  * are touched by exactly one partial-aggregated scan per query. */
object InferenceOps {

  /** FDR level for [[bhFdr]] — shared with the oracle SQL. */
  val FdrAlpha = 0.05

  /** 1/√2 as one driver-computed literal inlined into BOTH engines, so
    * the z → p float chain starts from an identical double. */
  val InvSqrt2: Double = 1.0 / math.sqrt(2.0)

  /** Abramowitz–Stegun 7.1.26 erfc approximation (|error| < 1.5e-7 —
    * far inside the stable-rounding barrier), evaluated in Horner form
    * with the SAME association order as the oracle SQL. x must be ≥ 0. */
  private[operators] def erfcAS(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t
      + lit(1.421413741)) * t + lit(-0.284496736)) * t
      + lit(0.254829592)) * t
    poly * exp(-(x * x))
  }

  /** q_bh_fdr: Benjamini–Hochberg FDR correction over the per-source
    * mean-length drift tests — each source's z = (mean_s − mean_g) /
    * (sd_g/√n_s) against the corpus, p = erfc(|z|/√2) (two-sided normal),
    * then the BH step-up at α = [[FdrAlpha]]: reject every source at or
    * below the LARGEST rank i with p_(i) ≤ i·α/m. Screening every slice
    * at α uncorrected would flag ~α·m clean sources per run; BH is the
    * standard correction a recurring drift dashboard ships.
    *
    * All moments come from one exact-integer scan (power sum in
    * DECIMAL(38,0)); the z/p/rank/step-up algebra runs on the
    * \|sources\|-row frame (rank + step-up as two bounded windows). */
  def bhFdr(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_s"),
        sum(col("n_chars")).cast("bigint").as("s_s"))
    val g = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("bigint").as("n_g"),
        sum(col("n_chars")).cast("bigint").as("s_g"),
        sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)"))
          .cast("double").as("s2_g"))
    val meanG = col("s_g").cast("double") / col("n_g")
    val varG = (col("s2_g") - col("s_g").cast("double") * meanG) /
      (col("n_g") - 1)
    val z = (col("s_s").cast("double") / col("n_s") - meanG) /
      (sqrt(varG) / sqrt(col("n_s").cast("double")))
    val scored = per.crossJoin(broadcast(g))
      .select(col("source"), col("n_s").as("n_docs"), z.as("z"),
        erfcAS(abs(z) * InvSqrt2).as("p"))
    val wRank = Window.orderBy(col("p"), col("source"))
    val wAll = Window.partitionBy()
    val wUp = Window.orderBy(col("p"), col("source"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    scored
      .withColumn("p_rank", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("bh_thresh",
        col("p_rank").cast("double") * FdrAlpha / col("m"))
      // step-up: rejected iff SOME rank at or above this one passes its
      // threshold (max of the 0/1 flag over the following rows)
      .withColumn("rejected",
        max(when(col("p") <= col("bh_thresh"), 1).otherwise(0)).over(wUp))
      .select(col("source"), col("n_docs"),
        stableRound4(col("z")).as("z"),
        round(col("p").cast("decimal(20,8)"), 6).cast("double").as("p"),
        col("p_rank"),
        round(col("bh_thresh").cast("decimal(20,8)"), 6).cast("double")
          .as("bh_thresh"),
        col("rejected"))
      .orderBy(col("p_rank"))
  }

  /** q_lognormal_fit: method-of-moments lognormal fit of the per-source
    * document-length distribution — μ̂ = mean(ln len), σ̂ = sd(ln len),
    * the implied mean e^{μ̂+σ̂²/2} and its ratio to the actual mean: a
    * ratio far from 1 says the slice is NOT lognormal (mixture/template
    * contamination), the cheap parametric cousin of [[StatOps.ksTest]].
    * One scan for the ln-moment sums per source; scalar algebra after. */
  def lognormalFit(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        avg(log(col("n_chars").cast("double"))).as("mu"),
        sum(log(col("n_chars").cast("double"))
          * log(col("n_chars").cast("double"))).as("s2"),
        avg(col("n_chars").cast("double")).as("actual_mean"))
    val varLn = (col("s2") - col("n") * col("mu") * col("mu")) /
      (col("n") - 1)
    m.filter(col("n") > 1)
      .select(col("source"), col("n").as("n_docs"),
        stableRound4(col("mu")).as("ln_mu"),
        stableRound4(when(varLn > 0, sqrt(varLn))).as("ln_sigma"),
        stableRound4(when(varLn > 0,
          exp(col("mu") + varLn / 2))).as("implied_mean"),
        stableRound4(col("actual_mean")).as("actual_mean"),
        stableRound4(when(varLn > 0,
          exp(col("mu") + varLn / 2) / col("actual_mean"))).as("fit_ratio"))
      .orderBy(col("source"))
  }

  /** ln(2/δ) at δ = 0.05 — driver-computed once, inlined as the same
    * double literal in both engines. */
  val Ln2OverDelta: Double = math.log(2.0 / 0.05)

  /** Short-document threshold for the audited rate. */
  val ShortDocChars = 200L

  /** q_hoeffding_bound: the distribution-free sample-size certificate
    * for every per-source rate the pipeline dashboards — for the
    * short-document rate p̂_s, the two-sided Hoeffding ε =
    * √(ln(2/δ)/(2n)) at δ = 0.05 and the clipped [p̂−ε, p̂+ε] band: the
    * "is n even large enough to quote this rate" gate a per-slice
    * monitor must ship before alerting on rate drift. One exact-count
    * scan; the bound is closed-form per source. */
  def hoeffdingBound(spark: SparkSession, dir: String): DataFrame = {
    val eps = sqrt(lit(Ln2OverDelta)
      / (lit(2.0) * col("n").cast("double")))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(when(col("n_chars") < ShortDocChars, 1L).otherwise(0L))
          .cast("bigint").as("n_short"))
      .select(col("source"), col("n").as("n_docs"),
        stableRound4(col("n_short").cast("double") / col("n"))
          .as("short_rate"),
        stableRound4(eps).as("eps95"),
        stableRound4(greatest(lit(0.0),
          col("n_short").cast("double") / col("n") - eps)).as("lo"),
        stableRound4(least(lit(1.0),
          col("n_short").cast("double") / col("n") + eps)).as("hi"))
      .orderBy(col("source"))
  }

  /** Number of ordered rollout waves for [[cochranArmitage]] — shared
    * with the oracle SQL. */
  val TrendWaves = 4

  /** q_cochran_armitage: the Cochran–Armitage trend test across ordered
    * rollout waves — does first-touch conversion trend MONOTONICALLY
    * across the staged-rollout buckets (user_id mod [[TrendWaves]], the
    * [[StatOps.abTest]] assignment convention extended to an ordered
    * dose), which a wave-by-wave grid of pairwise z-tests cannot answer
    * without the multiple-testing cost [[bhFdr]] exists to pay. With
    * per-wave totals N_i, conversions c_i and scores s_i = i:
    * T = Σ s_i(c_i − N_i·p̂), Var T = p̂(1−p̂)(Σ s_i²N_i − (Σ s_iN_i)²/N),
    * z = T/√Var, two-sided p = erfc(|z|/√2) (the [[bhFdr]] A&S chain).
    *
    * Plan: one per-user first-event aggregation (the abTest shape), one
    * [[TrendWaves]]-row rollup, closed-form scalar algebra — every term
    * an exact integer until the final float chain. */
  def cochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(struct(unix_micros(col("ts")).as("us"),
        col("event_id").as("eid"), col("event_type").as("et")))
        .as("first"))
      .select((col("user_id") % TrendWaves).as("wave"),
        (col("first.et") === "purchase").cast("int").as("converted"))
    val byWave = perUser.groupBy(col("wave"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("converted")).cast("bigint").as("c"))
    val s = col("wave").cast("double")
    val m = byWave.agg(
      count(lit(1)).cast("int").as("n_waves"),
      sum(col("n")).cast("bigint").as("n_total"),
      sum(col("c")).cast("bigint").as("conv_total"),
      sum(s * col("c").cast("double")).as("sc"),
      sum(s * col("n").cast("double")).as("sn"),
      sum(s * s * col("n").cast("double")).as("ssn"))
    val nD = col("n_total").cast("double")
    val p = col("conv_total").cast("double") / nD
    val t = col("sc") - p * col("sn")
    val v = p * (lit(1.0) - p) * (col("ssn") - col("sn") * col("sn") / nD)
    val z = t / sqrt(v)
    m.filter(col("conv_total") > 0 && col("conv_total") < col("n_total"))
      .select(col("n_waves"), col("n_total"), col("conv_total"),
        stableRound4(when(v > 0, z)).as("trend_z"),
        stableRound4(when(v > 0, erfcAS(abs(z) * InvSqrt2))).as("p_value"))
  }
}
