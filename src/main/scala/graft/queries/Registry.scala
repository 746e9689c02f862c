package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops._

/** Named query registry — the driver contract surface.
  *
  * Every entry is a (SparkSession, sfDir) => DataFrame paired (where SQL
  * can express it) with ANSI SQL for the DuckDB oracle. Conventions that
  * keep the hash-compare honest:
  *   - column names aliased identically on both sides;
  *   - deterministic ORDER BY (total order) on both sides;
  *   - money aggregates summed as DECIMAL (exact, order-insensitive),
  *     cast to DOUBLE at output — double sums would diverge between
  *     Spark's unordered partial aggregation and DuckDB at the rounding
  *     boundary;
  *   - quantities/counts are integral doubles → exact in any order.
  */
object Registry {

  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal revenue term: extendedprice * (1 - discount). */
  private def revenue: Column =
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** Exact decimal sum → double. The input must ALREADY be decimal —
    * re-casting a wider-scale decimal here would round per-row and bias
    * the sum (caught by the oracle on first run).
    */
  private def decSum(c: Column): Column = sum(c).cast("double")

  // ---------------------------------------------------------------- dedup

  /** D1 (SURVEY §2.4): latest-per-key dedup + join + agg — slice 0. */
  private val dedupLatest: Q = (s, dir) => {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // tie-break to a total order so the kept row is deterministic.
    val ties = Seq(col("l_extendedprice").desc, col("l_partkey").desc,
      col("l_suppkey").desc, col("l_quantity").desc, col("l_discount").desc)
    val li = Dedup.latestPerKey(Tables.lineitem(s, dir), Seq("l_orderkey"),
      "l_linenumber", ties)
    li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val dedupLatestSql =
    """WITH latest AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber DESC, l_extendedprice DESC, l_partkey DESC,
      |               l_suppkey DESC, l_quantity DESC, l_discount DESC) AS rn
      |    FROM lineitem) WHERE rn = 1)
      |SELECT o_orderpriority,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       round(avg(l_quantity), 4) AS avg_qty
      |FROM latest JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- joins

  /** J1/J2 (SURVEY §2.3): left-semi membership filter. */
  private val semiJoin: Q = (s, dir) => {
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }
  private val semiJoinSql =
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin

  /** Left-anti complement of J1. */
  private val antiJoin: Q = (s, dir) => {
    val returned = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    Tables.orders(s, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }
  private val antiJoinSql =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      |ORDER BY o_orderkey""".stripMargin

  /** J3/J4: 3-way inner equi-join chain + exact decimal revenue rollup. */
  private val join3Way: Q = (s, dir) => {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), decSum(revenue).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }
  private val join3WaySql =
    s"""SELECT c_mktsegment, count(*) AS cnt,
       |       CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** J5-shaped: fact ⋈ broadcast dim chain (supplier → nation → region). */
  private val broadcastDim: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("cnt"), decSum(revenue).as("revenue"))
      .orderBy(col("r_name"))
  }
  private val broadcastDimSql =
    s"""SELECT r_name, count(*) AS cnt,
       |       CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ----------------------------------------------------------------- aggs

  /** A1: group-average collapse (quantities are integral → exact). */
  private val groupAvg: Q = (s, dir) => {
    PivotAgg.groupAvg(Tables.lineitem(s, dir), Seq("l_orderkey"),
        "l_quantity", "avg_qty")
      .select(col("l_orderkey"), round(col("avg_qty"), 4).as("avg_qty"))
      .orderBy(col("l_orderkey"))
  }
  private val groupAvgSql =
    """SELECT l_orderkey, round(avg(l_quantity), 4) AS avg_qty
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** A2: long → wide pivot with explicit values (events by event_type). */
  private val pivotWide: Q = (s, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    // exact decimal sums as cell values: rounding an inexact double
    // quotient diverges between engines at .005 boundaries (DuckDB
    // pre-rounds the decimal repr, Spark rounds the binary value)
    val p = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double"))
    p.orderBy(col("user_id"))
  }
  private val pivotWideSql =
    Seq("click", "error", "purchase", "signup", "view").map { t =>
      s"""CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "$t""""
    }.mkString("SELECT user_id,\n", ",\n", "\nFROM events GROUP BY user_id ORDER BY user_id")

  /** Rollup with pinned null ordering. */
  private val rollupAgg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
  private val rollupAggSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Top-k by value with total-order tie-break → TakeOrderedAndProject. */
  private val topkOrderLimit: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc,
        col("l_quantity").asc)
      .limit(20)
  }
  private val topkOrderLimitSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey,
      |         l_suppkey, l_quantity
      |LIMIT 20""".stripMargin

  // -------------------------------------------------------------- windows

  /** Ranking window: top-3 priced lines within each order (rank ties keep
    * the row set deterministic even where row order isn't).
    */
  private val windowRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_extendedprice").desc)
    Tables.lineitem(s, dir)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"), col("rnk"))
      .orderBy(col("l_orderkey"), col("rnk"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
  }
  private val windowRankSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, rnk
      |FROM (SELECT *, rank() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_extendedprice DESC) AS rnk FROM lineitem)
      |WHERE rnk <= 3
      |ORDER BY l_orderkey, rnk, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin

  /** Analytic window: lag by event sequence (event_id is the total order —
    * ts has sub-microsecond precision DuckDB keeps but Spark truncates).
    */
  private val windowLag: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("value"), col("prev_value"),
        round(col("value") - col("prev_value"), 2).as("delta"))
      .orderBy(col("event_id"))
  }
  private val windowLagSql =
    """SELECT event_id, user_id, value,
      |       lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
      |       round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS delta
      |FROM events ORDER BY event_id""".stripMargin

  /** Frame-spec window: running sum, rows unbounded-preceding → current.
    * Sequential fold in order → bit-identical on both engines.
    */
  private val windowFrame: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("running_sum", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("value"), col("running_sum"))
      .orderBy(col("event_id"))
  }
  private val windowFrameSql =
    """SELECT event_id, user_id, value,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------- scalars

  /** E1/E3-family string cleanup (trim/upper/concat/substr/length). */
  private val stringClean: Q = (s, dir) => {
    Tables.customer(s, dir).select(
      col("c_custkey"),
      upper(trim(col("c_name"))).as("name_norm"),
      concat(upper(col("c_mktsegment")), lit("-"),
        col("c_nationkey").cast("string")).as("seg_key"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      length(col("c_name")).as("name_len"))
      .orderBy(col("c_custkey"))
  }
  private val stringCleanSql =
    """SELECT c_custkey, upper(trim(c_name)) AS name_norm,
      |       upper(c_mktsegment) || '-' || CAST(c_nationkey AS VARCHAR) AS seg_key,
      |       substring(c_name, 1, 8) AS name_prefix,
      |       length(c_name) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** E2-family: JSON extraction + null-on-junk cast coercion. */
  private val jsonExtract: Q = (s, dir) => {
    Tables.events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").try_cast("double").as("k_val"),
      col("event_type").try_cast("double").as("bad_cast"))
      .orderBy(col("event_id"))
  }
  private val jsonExtractSql =
    """SELECT event_id,
      |       TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val,
      |       TRY_CAST(event_type AS DOUBLE) AS bad_cast
      |FROM events ORDER BY event_id""".stripMargin

  /** P6/E4: NOT-contains filter with pandas na=False null semantics. */
  private val notContainsFilter: Q = (s, dir) => {
    Cleaning.filterNotContains(Tables.part(s, dir), "p_type", "BRASS")
      .select(col("p_partkey"), col("p_type"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }
  private val notContainsFilterSql =
    """SELECT p_partkey, p_type, p_brand FROM part
      |WHERE NOT coalesce(contains(p_type, 'BRASS'), false)
      |ORDER BY p_partkey""".stripMargin

  /** A5/P8: threshold null-out via the schema-driven caps fold. */
  private val thresholdNullout: Q = (s, dir) => {
    val renamed = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice").as("RETAIL (KCAL)"))
    Thresholds(renamed, Seq("p_partkey"))
      .orderBy(col("p_partkey"))
  }
  private val thresholdNulloutSql =
    """SELECT p_partkey,
      |       CASE WHEN p_retailprice <= 900 THEN round(p_retailprice, 2) END AS "RETAIL (KCAL)"
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date bucketing: day truncation (output as DATE on both sides). */
  private val dateTrunc: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("day"))
  }
  private val dateTruncSql =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Date arithmetic: shipping delay in days (ints → exact avg). */
  private val dateDiff: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_delay_days"),
        count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
  }
  private val dateDiffSql =
    """SELECT o_orderpriority,
      |       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay_days,
      |       count(*) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Array higher-order ops: dim, first element, L2 norm (sequential
    * double fold → bit-identical with DuckDB's list fold).
    */
  private val arrayNorm: Q = (s, dir) => {
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 4).as("first_elem"),
      round(VectorOps.l2Norm(col("embedding")), 4).as("l2_norm"))
      .orderBy(col("vec_id"))
  }
  private val arrayNormSql =
    """SELECT vec_id, len(embedding) AS dim,
      |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
      |       round(sqrt(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------- registry

  private val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_dedup_latest", dedupLatest, Some(dedupLatestSql)),
    ("q_semi_join", semiJoin, Some(semiJoinSql)),
    ("q_anti_join", antiJoin, Some(antiJoinSql)),
    ("q_join_3way", join3Way, Some(join3WaySql)),
    ("q_broadcast_dim", broadcastDim, Some(broadcastDimSql)),
    ("q_group_avg", groupAvg, Some(groupAvgSql)),
    ("q_pivot_wide", pivotWide, Some(pivotWideSql)),
    ("q_rollup", rollupAgg, Some(rollupAggSql)),
    ("q_topk_order_limit", topkOrderLimit, Some(topkOrderLimitSql)),
    ("q_window_rank", windowRank, Some(windowRankSql)),
    ("q_window_lag", windowLag, Some(windowLagSql)),
    ("q_window_frame", windowFrame, Some(windowFrameSql)),
    ("q_string_clean", stringClean, Some(stringCleanSql)),
    ("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    ("q_not_contains_filter", notContainsFilter, Some(notContainsFilterSql)),
    ("q_threshold_nullout", thresholdNullout, Some(thresholdNulloutSql)),
    ("q_date_trunc", dateTrunc, Some(dateTruncSql)),
    ("q_date_diff", dateDiff, Some(dateDiffSql)),
    ("q_array_norm", arrayNorm, Some(arrayNormSql))
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
