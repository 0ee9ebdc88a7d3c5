package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokensLower
import graft.functions.NumericFunctions.stableRound4
import graft.functions.VectorFunctions._

/** Keyword and hybrid retrieval over the corpus — the query-side primitives
  * a training-data pipeline uses to mine a corpus for topical documents
  * (seed expansion, targeted-domain upsampling, eval-set mining).
  *
  * BM25 follows Robertson & Zaragoza (2009), "The Probabilistic Relevance
  * Framework: BM25 and Beyond"; reciprocal-rank fusion follows Cormack,
  * Clarke & Buettcher (SIGIR 2009).
  *
  * Scale shape: the query term set is tiny and FIXED, so per-document term
  * frequencies are narrow `size(filter(tokens))` maps — no explode, no
  * (doc, token) shuffle at all. Corpus statistics (N, avgdl, per-term df)
  * collapse into ONE scalar aggregate row that is broadcast back onto the
  * scan; scoring is then a pure per-row expression and the top-k is a
  * TakeOrderedAndProject. Total cost at 100 TB: one corpus scan + one
  * 1-row broadcast — the same plan a search engine's impact-ordered scan
  * would hand-build.
  */
object RetrievalOps {

  /** BM25 parameters (the Robertson defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Fixed keyword query used by the declared queries. */
  val QueryTerms = Seq("join", "hash", "scan")

  /** RRF rank-constant (the value used in the original SIGIR'09 paper). */
  val RrfK = 60

  /** Per-term tf as a narrow array expression — no explode. */
  private def tf(toks: Column, term: String): Column =
    size(filter(toks, t => t === term)).cast("double")

  /** Per-document BM25 scores for `terms` (unordered; internal).
    * Columns: doc_id, bm25 (4-decimal stable-rounded). The score is a
    * chained sum in fixed term order so the oracle reproduces the float
    * addition order exactly. */
  def bm25Scores(spark: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensLower(col("text")).as("toks"))
    // one scalar aggregate: corpus size, average doc length, per-term df
    val statCols = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("toks"))).as("avgdl")) ++
      terms.map(t => sum(when(array_contains(col("toks"), t), 1L)
        .otherwise(0L)).cast("double").as(s"df_$t"))
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val scored = docs
      .select(Seq(col("doc_id"), size(col("toks")).cast("double").as("dl")) ++
        terms.map(t => tf(col("toks"), t).as(s"tf_$t")): _*)
      .crossJoin(broadcast(stats))
    val termScore: String => Column = t => {
      val idf = log((col("n_docs") - col(s"df_$t") + 0.5) /
        (col(s"df_$t") + 0.5) + 1.0)
      val norm = col(s"tf_$t") +
        lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))
      idf * (col(s"tf_$t") * (K1 + 1.0)) / norm
    }
    scored
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0.0)
      .select(col("doc_id"),
        stableRound4(terms.map(termScore).reduce(_ + _)).as("bm25"))
  }

  /** Declared query: top-20 documents by BM25 for the fixed keyword query.
    * Ranking key is the ROUNDED score (ties to doc_id) so the order is
    * engine-reproducible. */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    bm25Scores(spark, dir).orderBy(col("bm25").desc, col("doc_id")).limit(k)

  /** Declared query: hybrid dense+sparse retrieval fused with reciprocal
    * rank fusion. Dense side: exact cosine ranking of all vectors against
    * the probe embedding (vec_id 0). Sparse side: BM25 ranking for the
    * fixed keyword query. Each side is cut to its top-50 with a distributed
    * TakeOrderedAndProject FIRST; the rank numbering then runs over ≤50
    * rows (a deliberately tiny single-partition window — same pattern as
    * vocabCoverage), so no full-table window appears anywhere. The fusion
    * join is 50×50 rows. RRF score = Σ 1/(60+rank), 6-decimal rounded. */
  def rrfFusion(spark: SparkSession, dir: String, perList: Int = 50,
      k: Int = 20): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), l2Norm(col("embedding")).as("q_nrm"))
    val dense = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("id"),
        round(cosine(dotProduct(col("q_emb"), col("embedding")),
          col("q_nrm"), l2Norm(col("embedding"))), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(perList)
      .withColumn("rd", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("id"))))
      .select(col("id"), col("rd"))
    val sparse = bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(perList)
      .withColumn("rs", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id").as("id"), col("rs"))
    dense.join(sparse, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("rd"), lit(0)).as("rank_dense"),
        coalesce(col("rs"), lit(0)).as("rank_sparse"),
        round((coalesce(lit(1.0) / (col("rd") + RrfK), lit(0.0)) +
          coalesce(lit(1.0) / (col("rs") + RrfK), lit(0.0)))
          .cast("decimal(20,8)"), 6).cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** q_rank_eval: ranking-quality metrics for the BM25 ranker — the IR
    * eval pass (nDCG@10, MRR) a retrieval-backed curation pipeline runs
    * before trusting a ranker to mine training data. Graded relevance is
    * a pseudo-relevance proxy when no judgments exist: occurrence-volume
    * tiers over the query terms (total tf ≥ 10 → rel 3, ≥ 6 → 2, ≥ 3 →
    * 1, else 0 — term coverage alone saturates on this common-vocabulary
    * fixture, so the grade discriminates on volume, which BM25's length
    * normalization deliberately does NOT maximize — making the metric a
    * real comparison, not a tautology).
    * DCG@10 discounts the BM25 top-10 by log₂(rank+1); IDCG@10 is the
    * same sum over the collection-wide ideal ordering (top-10 by rel);
    * MRR is 1/rank of the first result with rel ≥ 2 (0 when none lands
    * in the top 10). One row out.
    *
    * Scale shape: relevance is a narrow per-row expression on the same
    * scan BM25 already makes; both top-10s are TakeOrderedAndProject;
    * the only window runs over the ≤ 20-row ranked frame (bounded by k,
    * not data). */
  def rankEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensLower(col("text")).as("toks"))
      .select(col("doc_id"),
        QueryTerms.map(t => size(filter(col("toks"), x => x === t)))
          .reduce(_ + _).as("cnt"))
      .select(col("doc_id"),
        when(col("cnt") >= 10, 3).when(col("cnt") >= 6, 2)
          .when(col("cnt") >= 3, 1).otherwise(0).as("rel"))
    def dcgTerm = (pow(lit(2.0), col("rel")) - 1.0) /
      log(2.0, col("rank") + 1.0)
    val ranked = bm25TopK(spark, dir, 20)
      .join(rel, Seq("doc_id"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("rank") <= k)
    val dcg = ranked.agg(
      sum(dcgTerm).as("dcg"),
      min(when(col("rel") >= 2, col("rank"))).as("first_rel"),
      count(lit(1)).as("n_ranked"))
    val idcg = rel.orderBy(col("rel").desc, col("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rel").desc, col("doc_id"))))
      .agg(sum(dcgTerm).as("idcg"))
    // broadcast the 1-row idcg aggregate explicitly (deterministic plan
    // across configs; cf. the hinted scalar crosses in StatOps)
    dcg.crossJoin(broadcast(idcg))
      .select(lit(k).as("k"), col("n_ranked"),
        stableRound4(col("dcg")).as("dcg_at_k"),
        stableRound4(col("idcg")).as("idcg_at_k"),
        stableRound4(col("dcg") / col("idcg")).as("ndcg_at_k"),
        stableRound4(coalesce(lit(1.0) / col("first_rel"), lit(0.0)))
          .as("mrr"))
  }

  /** RBO depth and persistence (Webber et al. 2010): compared list depth
    * and the top-weightedness parameter, shared with the oracle. */
  val RboDepth = 10
  val RboP = 0.9

  /** Per-candidate RBO contribution table, indexed by m = max(rank_A,
    * rank_B): swapping the truncated-RBO double sum
    * (1−p)·Σ_d p^(d−1)·|A_d ∩ B_d|/d to per-candidate form gives each
    * common candidate the weight (1−p)·Σ_{d=m..D} p^(d−1)/d. Computed
    * ONCE here in a fixed fold order and inlined as literals into BOTH
    * engines (the one-shot-constants rule — Double.toString round-trips,
    * so the engines see identical doubles and the only remaining float
    * op is the per-query ordered fold, replicated exactly). */
  def rboTable(depth: Int = RboDepth, p: Double = RboP): Array[Double] = {
    val oneMinusP = 1.0 - p
    Array.tabulate(depth) { i =>
      val m = i + 1
      var s = 0.0
      var d = m
      while (d <= depth) { s += math.pow(p, d - 1) / d; d += 1 }
      oneMinusP * s
    }
  }

  /** q_rbo: rank-biased overlap between the EXACT cosine top-10 ranking
    * and the IVF ANN top-10 ranking, per probe query — the
    * order-sensitive companion to q_ann_recall's set-based recall (RBO
    * weights agreement at the top of the list, which is what a retrieval
    * consumer actually sees; Webber, Moffat & Zobel, TOIS 2010). Output:
    * (q_id, n_common, top1_agree, rbo), rbo ∈ [0, 1−p^D·…] truncated at
    * depth `RboDepth`.
    *
    * Determinism: both input rankings are already hash-proven
    * deterministic queries; the per-candidate weights are driver
    * literals; the per-query sum is an ORDERED fold over the sorted m
    * list, replicated in DuckDB as list_reduce over the same sorted
    * transform (0.0-seeded vs first-element-seeded folds agree bitwise
    * because 0.0 + x = x). Scale shape: two ANN queries + one
    * (q_id, cand_id) equality join + a ≤depth-row-per-query aggregate —
    * strictly cheaper than either input ranking. */
  def rankBiasedOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tbl = rboTable()
    val a = SimilarityOps.simTopK(spark, dir)
      .select(col("q_id"), col("rn").as("rna"), col("cand_id"))
    val b = IvfOps.simIvf(spark, dir)
      .select(col("q_id"), col("rn").as("rnb"), col("cand_id"))
    val m = a.join(b, Seq("q_id", "cand_id"))
      .select(col("q_id"), greatest(col("rna"), col("rnb")).as("m"))
    val agg = m.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_common"),
        max(col("m") === 1).as("top1_agree"),
        aggregate(sort_array(collect_list(col("m"))), lit(0.0),
          (acc, mm) => acc + element_at(lit(tbl), mm)).as("rbo_raw"))
    a.select(col("q_id")).distinct()
      .join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("top1_agree"), lit(false)).as("top1_agree"),
        stableRound4(coalesce(col("rbo_raw"), lit(0.0))).as("rbo"))
      .orderBy(col("q_id"))
  }

  /** Dirichlet smoothing mass (q_query_likelihood) — Zhai & Lafferty's
    * recommended μ≈2000 for short queries. */
  val DirichletMu = 2000.0

  /** q_query_likelihood: language-model retrieval with Dirichlet-prior
    * smoothing (Zhai & Lafferty, SIGIR 2001) — the probabilistic
    * counterpart to [[bm25TopK]] and the second standard keyword ranker:
    * score(q,d) = Σ_t ln((tf_td + μ·p̂(t|C)) / (|d| + μ)), where the
    * collection model p̂(t|C) = cf_t / Σ|d| backs off unseen terms.
    * Unlike BM25's df-based idf, the smoothing uses total collection
    * frequency — so the two rankers genuinely disagree on volume-heavy
    * docs and RRF fusion has something to fuse.
    *
    * Same scale shape as BM25: per-term tf is a narrow array expression
    * on one scan (no explode), collection statistics collapse into ONE
    * scalar aggregate broadcast back onto the scan, scoring is per-row
    * literal algebra in fixed term order (chained sum, oracle-replayable),
    * and the top-k is a TakeOrderedAndProject. One corpus scan at any
    * size. Every doc scores (smoothing gives zero-tf docs a finite
    * score), so the ranking key is the ROUNDED score with doc_id ties. */
  def queryLikelihood(spark: SparkSession, dir: String, k: Int = 20,
      terms: Seq[String] = QueryTerms, mu: Double = DirichletMu): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensLower(col("text")).as("toks"))
    val statCols = Seq(sum(size(col("toks"))).cast("double").as("n_tokens")) ++
      terms.map(t => sum(size(filter(col("toks"), x => x === t)))
        .cast("double").as(s"cf_$t"))
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val termScore: String => Column = t =>
      log((col(s"tf_$t") + lit(mu) * (col(s"cf_$t") / col("n_tokens")))
        / (col("dl") + lit(mu)))
    docs
      .select(Seq(col("doc_id"), size(col("toks")).cast("double").as("dl")) ++
        terms.map(t => tf(col("toks"), t).as(s"tf_$t")): _*)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        stableRound4(terms.map(termScore).reduce(_ + _)).as("ql_score"))
      .orderBy(col("ql_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Feedback depth / expansion width for [[rocchioExpansion]] — shared
    * with the oracle SQL. */
  val PrfFeedbackDocs = 10
  val PrfExpansionTerms = 15

  /** q_rocchio_prf: pseudo-relevance-feedback query expansion (Rocchio's
    * β term over the BM25 top-[[PrfFeedbackDocs]] feedback set) — the
    * classic second-round retrieval operator: treat the first-pass top
    * documents as relevant, score every candidate term by
    * feedback-tf × corpus-idf (ln(N/df)), and emit the
    * top-[[PrfExpansionTerms]] expansion terms with their weights. The
    * original query terms, the [[graft.operators.TextOps]] stopword set
    * and sub-3-char tokens are excluded (the α/original component is the
    * query itself; this emits the expansion MODEL — rescoring reuses
    * [[bm25Scores]] with the widened term list).
    *
    * Scale shape: the feedback set is [[PrfFeedbackDocs]] rows (ranking
    * key is the ROUNDED BM25 score, ties to doc_id — engine-reproducible),
    * so feedback term counts are a broadcast-sized frame; the corpus-df
    * table is one distinct-explode aggregation (the established
    * [[graft.operators.CorpusOps]] tfidf cost family), joined
    * broadcast-side. Ordering ties break on the rounded weight then
    * term. */
  def rocchioExpansion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensLower(col("text")).as("toks"))
    val fb = bm25TopK(spark, dir, PrfFeedbackDocs).select(col("doc_id"))
    val stop = QueryTerms ++ graft.operators.TextOps.EnWords
    val fbTf = docs.join(broadcast(fb), Seq("doc_id"))
      .select(explode(col("toks")).as("term"))
      .filter(length(col("term")) >= 3 && !col("term").isin(stop: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("bigint").as("tf_fb"))
    val df = docs
      .select(explode(array_distinct(col("toks"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("bigint").as("df"))
    val tot = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    df.join(broadcast(fbTf), Seq("term"))
      .crossJoin(broadcast(tot))
      .select(col("term"), col("tf_fb"), col("df"),
        stableRound4(col("tf_fb").cast("double")
          * log(col("n_docs") / col("df"))).as("weight"))
      .orderBy(col("weight").desc, col("term"))
      .limit(PrfExpansionTerms)
  }
}
