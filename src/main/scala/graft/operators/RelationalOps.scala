package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators, generalized from the reference pipeline's
  * surface (SURVEY.md §2.1 R2–R16: scan/limit/filter/isin-count/cast/
  * schema-echo/derived-name/partition-agg/full-scan-agg).
  *
  * Reference evidence (shyambh/e2e-data-pipeline):
  *  - scan + row cap: `ingest_data.py:49` (`pd.read_csv(nrows=100000)`)
  *  - filter != 0:    `ingest_data.py:29-38`
  *  - isin count:     `ingest_data.py:32,36`
  *  - conditional ts cast: `ingest_data.py:67-76`
  *  - schema-only DDL write: `ingest_data.py:52`
  *  - derived names / partition paths: `ingest_data.py:20-22,159,169`
  *
  * Determinism contract (SURVEY.md §2.2): every query ends with a total-order
  * `orderBy` on a unique key and rounds floating-point aggregates, so the
  * DuckDB-oracle hash compare is stable. All plans are single-pass scans or
  * one shuffle — at 100 TB each is a narrow scan + (optionally) one exchange;
  * filters and projections push into the parquet scan.
  */
object RelationalOps {

  /** R2+R10: ordered scan with row cap. Catalyst plans TakeOrderedAndProject
    * (no global sort materialization) — the right shape at any scale. */
  /** Total order over lineitem: (orderkey, linenumber) alone is NOT unique
    * in the generated data (the generator doesn't sequence linenumbers per
    * order), so ties would make limits/row-orders engine-dependent. */
  private[operators] val LineitemOrder = Seq(
    col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
    col("l_suppkey"), col("l_extendedprice"))

  def scanLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(LineitemOrder: _*)
      .limit(100)

  /** R4: the reference's `passenger_count != 0` filter, generalized to
    * `l_quantity <> 0`. Predicate pushes down to the parquet scan. */
  def filterNe(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") =!= 0)
      .orderBy(LineitemOrder: _*)

  /** R5: membership predicate + boolean-sum data-quality metric
    * (`isin([0]).sum()` in the reference). Map-side partial aggregation
    * means one scalar crosses the shuffle regardless of input size. */
  def isinCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        sum(when(col("l_returnflag").isin("R", "A"), 1L).otherwise(0L))
          .as("n_matching"),
        count(lit(1)).as("n_total"))

  /** R7: string/timestamp→date-part casts (the reference's `pd.to_datetime`).
    * Emits date + hour rather than the raw timestamp because the events table
    * carries nanosecond precision that Spark truncates to micros. */
  def castTimestamp(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        to_date(col("ts")).as("day"),
        hour(col("ts")).as("hr"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** R6: schema-only projection (`df.head(n=0).to_sql` → create-table DDL).
    * `limit(0)` lets Catalyst prune the scan entirely. */
  def schemaOnly(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).limit(0)

  /** R16: derived-name expressions (the reference's f-string table/dataset
    * names, `ingest_data.py:159,169`) as a column computation. */
  def derivedName(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        concat(
          lit("orders_"),
          year(col("o_orderdate")).cast("string"),
          lit("_"),
          lpad(month(col("o_orderdate")).cast("string"), 2, "0"))
          .as("part_label"))
      .orderBy(col("o_orderkey"))

  /** R15 generalized: per-(year, month) partition statistics — the aggregate
    * view of the reference's hand-built Hive-style partition layout. */
  def partitionAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("sum_total"))
      .orderBy(col("yr"), col("mon"))

  /** CDC upsert/merge: `updates` rows replace target rows that share their
    * key; unmatched updates insert. One anti-join shuffle on the key plus a
    * union — the MERGE INTO shape without a table format, and the batch
    * twin of [[graft.operators.EventOps.latestEvent]] compaction. At
    * 100 TB both sides shuffle once on the key; with a bucketed target the
    * exchange disappears entirely (see ScaleSpec's bucketed-join test). */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Declared upsert query: orders with a synthetic CDC batch — every
    * key ≡ 0 (mod 10) gets a status/price correction, and a shifted key
    * range arrives as brand-new rows. Deterministic: the batch is a pure
    * function of the table. */
  def upsertOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val corrections = orders.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1.0).as("o_totalprice"))
    val inserts = orders.filter(col("o_orderkey") % 1000 === 1)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    upsert(orders, corrections.unionByName(inserts), "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** R3+R19 generalized: full-scan pricing-summary aggregate (TPC-H Q1 shape)
    * — the reference's chunked scan+filter+cast+write loop re-expressed as one
    * declarative aggregation. Partial aggregation makes the shuffle carry only
    * (6 groups × 8 aggregates) however large the input. */
  def chunkedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        graft.functions.NumericFunctions.stableRound4(avg(col("l_quantity")))
          .as("avg_qty"),
        graft.functions.NumericFunctions.stableRound4(avg(col("l_extendedprice")))
          .as("avg_price"),
        graft.functions.NumericFunctions.stableRound4(avg(col("l_discount")))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Column profiler over the events table: per-column row count, null
    * count, and exact distinct count — the schema-health report a pipeline
    * runs on every new data drop (the Deequ/"data quality" primitive).
    * All columns profile in ONE pass: Spark rewrites the multi-distinct
    * aggregate into a single Expand + two-level aggregation, so the table
    * is scanned once however many columns are profiled.
    *
    * Scale note: exact COUNT(DISTINCT) is kept because the oracle checks
    * it; at 100 TB swap `countDistinct` for `approx_count_distinct` (the
    * HLL path in SketchOps) — same one-scan shape, bounded memory. */
  def nullProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val stackExpr = cols.map(c => s"'$c', null_$c, dist_$c").mkString(", ")
    Tables.events(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackExpr) AS (column_name, n_null, n_distinct)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"))
      .orderBy(col("column_name"))
  }

  /** q_scd2: Slowly-Changing-Dimension Type-2 build from the events change
    * stream — the dimension-table maintenance pattern behind every
    * warehouse user/account dimension. Per user, consecutive runs of the
    * same event_type collapse to one VERSION row with half-open
    * [valid_from, valid_to) bounds; the open version has valid_to NULL and
    * is_current = 1.
    *
    * Two windows, both partitioned by the dimension key (user_id) — the
    * natural parallelism of the problem; no global window anywhere. Change
    * detection is lag(), bound closing is lead() over the surviving change
    * rows — lead runs AFTER the filter so the closing bound skips over the
    * collapsed run, landing on the next real state change. Time bounds are
    * pinned to the µs epoch on both engines (the events table's ns
    * timestamps truncate differently otherwise — see latestEvent). */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("us"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("version").cast("int").as("version"),
        col("event_type").as("state"),
        col("us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** q_pit_join: point-in-time correct dimension join — the feature-store
    * staple that prevents label leakage. For every purchase event (the
    * "label" observation), look up the user's [[scd2]] dimension version
    * that was valid ONE HOUR BEFORE the purchase — features must come
    * from strictly before the label's as-of time, never from the future
    * or the label's own instant. Interval semantics follow the SCD2
    * contract: valid_from ≤ as-of < valid_to, open version matches
    * everything after its valid_from; purchases whose as-of precedes the
    * user's first version (a brand-new user) resolve to state 'none' /
    * version −1 — the honest "no feature yet" row a training pipeline
    * must emit rather than silently leak the first state backwards.
    *
    * Scale shape: equality join on the high-cardinality user key with the
    * interval containment as a residual — per user the version list is
    * change-count-sized, so the join fan-out is bounded by state changes,
    * not events²; at most one version matches (the intervals partition
    * the timeline). No window beyond the ones [[scd2]] already runs. */
  def pitJoin(spark: SparkSession, dir: String,
      lookbackUs: Long = 3600L * 1000000L): DataFrame = {
    val dim = scd2(spark, dir)
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"))
    val obs = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("asof_us", col("us") - lookbackUs)
    obs.join(dim,
        obs("user_id") === dim("user_id")
          && dim("valid_from") <= obs("asof_us")
          && (dim("valid_to").isNull || obs("asof_us") < dim("valid_to")),
        "left")
      .select(obs("event_id"), obs("user_id"), obs("us").as("label_us"),
        coalesce(col("state"), lit("none")).as("state_asof"),
        coalesce(col("version"), lit(-1)).as("dim_version"))
      .orderBy(col("event_id"))
  }

  /** q_incr_rollup: incremental materialized-rollup maintenance — the
    * Delta/Iceberg MERGE pattern for keeping a daily revenue rollup fresh
    * without rescanning history. The "stored" rollup is the aggregate of
    * everything before the cutover month; the "delta" is the new data; the
    * refreshed view = re-aggregating the UNION OF PARTIAL STATES (sum/count
    * partials merge associatively; avg is derived at read time, never
    * stored). The oracle is the full recompute over all rows — equality IS
    * the correctness claim: merging state with a delta gives byte-identical
    * results to rescanning history.
    *
    * Scale shape: history is aggregated ONCE into |days| rows of state;
    * each refresh touches only the delta scan plus a |days|-row merge —
    * the 100 TB rollup cost becomes proportional to new data, not total
    * data. (Here both sides read the same table with complementary pushed
    * filters; in production the state side is a stored table.) */
  def incrRollup(spark: SparkSession, dir: String): DataFrame = {
    val cutover = lit("1997-01-01").cast("timestamp")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    val stored = partial(
      Tables.orders(spark, dir).filter(col("o_orderdate") < cutover))
    val delta = partial(
      Tables.orders(spark, dir).filter(col("o_orderdate") >= cutover))
    stored.unionAll(delta)
      .groupBy(col("day"))
      .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n_orders"))
      .select(col("day"), round(col("rev"), 4).as("revenue"),
        col("n_orders"),
        graft.functions.NumericFunctions
          .stableRound4(col("rev") / col("n_orders")).as("avg_order"))
      .orderBy(col("day"))
  }

  /** q_zorder: Morton (Z-order) clustering-key layout diagnostic. Orders
    * are bucketized on two dimensions (price band, order-day), the two
    * 8-bit bucket ids are bit-interleaved into a 16-bit Z-key, and the
    * query reports per-Z-range (64 consecutive keys ≈ one target file)
    * row counts and min/max of BOTH dimensions — exactly the footer stats
    * a lakehouse writer would persist after `.repartitionByRange(zkey)`.
    * Tight per-range min/max spans are what make 2-D data skipping work:
    * a predicate on EITHER dimension prunes files, which neither
    * single-column sort order can offer. The key derivation is pure
    * codegen'd bit arithmetic on the scan — no shuffle (the real write
    * path adds one range-repartition by zkey). */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.orders(spark, dir).select(
      least(floor(col("o_totalprice") / 2000), lit(255)).cast("int").as("bx"),
      pmod(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")),
        lit(256)).cast("int").as("by"))
    val zkey = (0 until 8).map(i =>
      shiftright(col("bx"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i))
        + shiftright(col("by"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)))
      .reduce(_ + _)
    buckets
      .withColumn("zrange", (zkey / 64).cast("int"))
      .groupBy(col("zrange"))
      .agg(count(lit(1)).as("n"),
        min(col("bx")).as("min_price_bucket"),
        max(col("bx")).as("max_price_bucket"),
        min(col("by")).as("min_day_bucket"),
        max(col("by")).as("max_day_bucket"))
      .orderBy(col("zrange"))
  }

  /** q_compaction_plan: the table-maintenance planner for the small-files
    * problem — per (year, month) partition of the fact, row count, an
    * estimated on-disk size from the measured per-partition byte widths
    * (lineitem payload columns concatenated — a deterministic proxy both
    * engines compute identically), the target file count at
    * `targetRowsPerFile`, and flags for the two layout pathologies:
    * `needs_compact` (partition would produce more, smaller files than
    * one per `targetRowsPerFile`) and `small_partition` (the whole
    * partition is under a tenth of one target file — a merge-up
    * candidate). This is the planning half of OPTIMIZE/compaction in
    * table formats; the execution half is a partition-pruned rewrite of
    * exactly the flagged partitions (same write path as R15's
    * partitioned layout). One scan + one partial-aggregated shuffle of
    * |partitions| rows. */
  def compactionPlan(spark: SparkSession, dir: String,
      targetRowsPerFile: Long = 50000L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"),
        // deterministic byte-width proxy: numeric cols as fixed-width,
        // flags as their string lengths
        (lit(8 * 4) + lit(8 * 4)
          + length(col("l_returnflag")) + length(col("l_linestatus")))
          .cast("long").as("row_bytes"))
    li.groupBy(col("yr"), col("mon"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("row_bytes")).as("est_bytes"))
      .select(col("yr"), col("mon"), col("n_rows"), col("est_bytes"),
        ceil(col("n_rows").cast("double") / targetRowsPerFile)
          .cast("long").as("target_files"),
        (col("n_rows") > targetRowsPerFile).as("needs_compact"),
        (col("n_rows") < targetRowsPerFile / 10).as("small_partition"))
      .orderBy(col("yr"), col("mon"))
  }

  /** q_snapshot_diff: the CDC diff between two table snapshots — every key
    * classified insert / delete / update / unchanged, with row counts and
    * the update family's absolute value drift. The companion to
    * [[upsertOrders]] (which APPLIES changes) and [[scd2]] (which
    * HISTORIZES them): this one AUDITS what changed between versions —
    * the "what did last night's load actually do" report.
    *
    * The "new" snapshot is derived deterministically from the shipped
    * orders table (no second snapshot exists in the fixture; the dials
    * are documented): keys ≡0 (mod 97) deleted, keys ≡0 (mod 13)
    * repriced ×1.05, keys ≡0 (mod 101) re-inserted under key+10⁹.
    *
    * Plan: one full-outer join on the key — each side shuffles exactly
    * once, pre-projected to (key, compared columns); classification is a
    * null-pattern CASE on the joined row, then a 4-row aggregate. At
    * production scale both snapshots would be bucketed by key, turning
    * the diff into a zipper merge with NO shuffle (ScaleSpec holds the
    * bucketed-join-elides-exchange proof for this layout). */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val old = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
    val neu = old
      .filter(col("key") % 97 =!= 0)
      .withColumn("price",
        when(col("key") % 13 === 0, round(col("price") * 1.05, 4))
          .otherwise(col("price")))
      .unionByName(old.filter(col("key") % 101 === 0)
        .withColumn("key", col("key") + 1000000000L))
    val diff = old.select(col("key").as("k_old"), col("price").as("p_old"),
        col("status").as("s_old"))
      .join(neu.select(col("key").as("k_new"), col("price").as("p_new"),
        col("status").as("s_new")),
        col("k_old") === col("k_new"), "full_outer")
      .select(
        when(col("k_old").isNull, "insert")
          .when(col("k_new").isNull, "delete")
          .when(col("p_old") =!= col("p_new")
            || col("s_old") =!= col("s_new"), "update")
          .otherwise("unchanged").as("change_type"),
        when(col("k_old").isNotNull && col("k_new").isNotNull,
          abs(col("p_new") - col("p_old"))).otherwise(lit(0.0)).as("drift"))
    diff.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        stableRound4(sum(col("drift"))).as("abs_price_drift"))
      .orderBy(col("change_type"))
  }

  /** q_incr_join: incremental maintenance of a JOINED rollup under a CDC
    * batch — the signed-delta (differential) processing at the core of
    * every incremental-view-maintenance engine, exercised on the join
    * path that [[incrRollup]]'s single-table case doesn't cover. The view
    * is revenue-by-market-segment over orders ⋈ customer; the change
    * batch is [[snapshotDiff]]'s synthetic CDC (deletes %97, +5% price
    * updates %13, key-shifted inserts %101). Maintenance touches ONLY the
    * delta: deletes contribute (−price, −1), updates (Δprice, 0), inserts
    * (+price, +1), each routed to its segment through the same broadcast
    * dimension join the view uses; merged = stored partials ∪ deltas,
    * re-aggregated. The declared result is the MERGED view; the oracle
    * recomputes the v2 join from scratch — equality IS the correctness
    * claim, as in incrRollup. Revenue flows as exact 10⁻⁴-unit integers
    * so merge order cannot produce float-association drift between the
    * incremental and recomputed sides.
    *
    * Scale shape: the stored side is |segments| partials maintained from
    * history ONCE; each refresh costs the delta scan + broadcast dim join
    * + a |segments|-row merge — at 100 TB the joined view's refresh cost
    * is proportional to the change batch, never the fact table. */
  def incrJoinRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val cust = broadcast(Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")))
    val units = round(col("price") * 10000).cast("long")
    val v1 = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        col("o_totalprice").as("price"))
    def segmented(df: DataFrame): DataFrame =
      df.join(cust, col("cust") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("du"), col("dn"))
    // stored: the view's partial state from history (rev units + counts)
    val stored = segmented(v1.select(col("cust"), units.as("du"),
      lit(1L).as("dn")))
    // signed deltas straight from the CDC rules — no v2 rescan anywhere
    val deletes = v1.filter(col("key") % 97 === 0)
      .select(col("cust"), (-units).as("du"), lit(-1L).as("dn"))
    val updates = v1.filter(col("key") % 97 =!= 0 && col("key") % 13 === 0)
      .select(col("cust"),
        (round(round(col("price") * 1.05, 4) * 10000).cast("long")
          - units).as("du"), lit(0L).as("dn"))
    val inserts = v1.filter(col("key") % 101 === 0)
      .select(col("cust"), units.as("du"), lit(1L).as("dn"))
    stored
      .unionAll(segmented(deletes.unionAll(updates).unionAll(inserts)))
      .groupBy(col("seg"))
      .agg(sum(col("du")).as("u"), sum(col("dn")).as("n_orders"))
      .select(col("seg"), col("n_orders"),
        stableRound4(col("u").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("seg"))
  }

  /** q_skip_audit: quantifies what the [[zorderLayout]] layout actually
    * buys — for one fixed 2-D predicate (price bucket ∈ [10,25] AND day
    * bucket ∈ [40,90]), how much of the table would each of three
    * physical layouts let a reader SKIP using only per-file min/max
    * footer stats? "Files" are modeled as equal-key-width ranges of 64
    * consecutive layout keys: lexicographic (price, day), lexicographic
    * (day, price), and the interleaved Morton key — the two single-column
    * sort orders a warehouse DBA would reach for first, and the Z-order
    * alternative. A range is scanned iff its [min,max] box intersects the
    * predicate on BOTH dimensions (exactly the footer-pruning test); the
    * report per layout: non-empty ranges, ranges scanned, rows scanned,
    * rows actually matching (identical across layouts — the invariant
    * that makes the comparison honest), and the scanned-row fraction.
    * At 100 TB this is the audit run BEFORE committing to a re-cluster:
    * one scan (the three layout keys are codegen'd arithmetic on the same
    * bucketized row), one partial-aggregated shuffle keyed by
    * (layout, range) — ≤ 3·1024 groups — then a 3-group rollup. */
  def skipAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NumericFunctions.stableRound4
    val base = Tables.orders(spark, dir).select(
      least(floor(col("o_totalprice") / 2000), lit(255)).cast("int").as("bx"),
      pmod(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")),
        lit(256)).cast("int").as("by"))
    val zkey = (0 until 8).map(i =>
      shiftright(col("bx"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i))
        + shiftright(col("by"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)))
      .reduce(_ + _)
    // one row per (layout, range): the same bucketized scan feeds all
    // three layout keys — no re-read, the explode is 3× fan-out of a
    // 2-int row
    val tagged = base.select(col("bx"), col("by"),
      explode(array(
        struct(lit("price_day").as("layout"),
          ((col("bx") * 256 + col("by")) / 64).cast("int").as("rng")),
        struct(lit("day_price").as("layout"),
          ((col("by") * 256 + col("bx")) / 64).cast("int").as("rng")),
        struct(lit("zorder").as("layout"),
          (zkey / 64).cast("int").as("rng")))).as("t"))
      .select(col("t.layout").as("layout"), col("t.rng").as("rng"),
        col("bx"), col("by"))
    val matches = col("bx").between(10, 25) && col("by").between(40, 90)
    val ranges = tagged.groupBy(col("layout"), col("rng"))
      .agg(count(lit(1)).as("n"),
        min(col("bx")).as("minx"), max(col("bx")).as("maxx"),
        min(col("by")).as("miny"), max(col("by")).as("maxy"),
        sum(matches.cast("long")).as("n_match"))
    // footer-pruning test: scan iff the range's min/max box intersects
    // the predicate box on both dimensions
    val scanned = col("maxx") >= 10 && col("minx") <= 25 &&
      col("maxy") >= 40 && col("miny") <= 90
    ranges.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_ranges"),
        sum(scanned.cast("long")).as("n_scanned_ranges"),
        sum(col("n")).as("rows_total"),
        sum(when(scanned, col("n")).otherwise(lit(0L))).as("rows_scanned"),
        sum(col("n_match")).as("rows_matching"))
      .select(col("layout"), col("n_ranges"), col("n_scanned_ranges"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        stableRound4(col("rows_scanned").cast("double") / col("rows_total"))
          .as("scan_frac"))
      .orderBy(col("layout"))
  }
}
