package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is a deterministic query (total-order `orderBy`,
  * rounded float aggregates, UTC session timezone) over the test tables at
  * `\$dir/<table>.parquet`. [[oracleSql]] holds the ANSI-conservative DuckDB
  * equivalent; keys without an oracle get the driver's weaker rows-only check.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary — the reference pipeline's semantic core
    * (scan → filter → derive → aggregate; SURVEY.md §7.1). */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.chunkedAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_limit"     -> (RelationalOps.scanLimit _),
    "q_filter_ne"      -> (RelationalOps.filterNe _),
    "q_isin_count"     -> (RelationalOps.isinCount _),
    "q_cast_timestamp" -> (RelationalOps.castTimestamp _),
    "q_schema_only"    -> (RelationalOps.schemaOnly _),
    "q_derived_name"   -> (RelationalOps.derivedName _),
    "q_partition_agg"  -> (RelationalOps.partitionAgg _),
    "q_chunked_agg"    -> (RelationalOps.chunkedAgg _),
    "q_join_enrich"    -> (JoinOps.joinEnrich _),
    "q_join_agg"       -> (JoinOps.joinAgg _),
    "q_semi_join"      -> (JoinOps.semiJoin _),
    "q_anti_join"      -> (JoinOps.antiJoin _),
    "q_topk"           -> (JoinOps.topK _),
  )

  /** DuckDB oracle for each SQL-expressible query. Integer-typed derived
    * columns are CAST explicitly because DuckDB widens (year()→BIGINT,
    * SUM(int)→HUGEINT, ROW_NUMBER()→BIGINT) where Spark keeps int/long. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_limit" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "q_filter_ne" ->
      "SELECT * FROM lineitem WHERE l_quantity <> 0 ORDER BY l_orderkey, l_linenumber",
    "q_isin_count" ->
      ("SELECT CAST(SUM(CASE WHEN l_returnflag IN ('R','A') THEN 1 ELSE 0 END) AS BIGINT) AS n_matching, " +
        "COUNT(*) AS n_total FROM lineitem"),
    "q_cast_timestamp" ->
      ("SELECT event_id, CAST(ts AS DATE) AS day, CAST(hour(ts) AS INTEGER) AS hr, event_type " +
        "FROM events ORDER BY event_id"),
    "q_schema_only" ->
      "SELECT * FROM lineitem WHERE 1=0",
    "q_derived_name" ->
      ("SELECT o_orderkey, 'orders_' || CAST(year(o_orderdate) AS VARCHAR) || '_' || " +
        "lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') AS part_label " +
        "FROM orders ORDER BY o_orderkey"),
    "q_partition_agg" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mon, " +
        "COUNT(*) AS n_orders, round(SUM(o_totalprice), 4) AS sum_total " +
        "FROM orders GROUP BY 1, 2 ORDER BY yr, mon"),
    "q_chunked_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(SUM(l_quantity), 4) AS sum_qty, " +
        "round(SUM(l_extendedprice), 4) AS sum_base_price, " +
        "round(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, " +
        "round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge, " +
        "round(AVG(l_quantity), 4) AS avg_qty, " +
        "round(AVG(l_extendedprice), 4) AS avg_price, " +
        "round(AVG(l_discount), 4) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q_join_enrich" ->
      ("SELECT o_orderkey, o_totalprice, c_name, n_name, r_name " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "ORDER BY o_orderkey"),
    "q_join_agg" ->
      ("SELECT n_name, round(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue, " +
        "COUNT(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "q_semi_join" ->
      ("SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders o " +
        "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45) " +
        "ORDER BY o_orderkey"),
    "q_anti_join" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) " +
        "ORDER BY c_custkey"),
    "q_topk" ->
      ("SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, round(o_totalprice, 4) AS o_totalprice " +
        "FROM (SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 5 ORDER BY o_orderpriority, rn"),
  )
}
