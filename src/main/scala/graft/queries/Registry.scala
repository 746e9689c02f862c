package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Named query registry — the driver contract surface.
  *
  * Every entry is a (SparkSession, sfDir) => DataFrame paired (where SQL can
  * express it) with ANSI SQL for the DuckDB oracle. Column names are aliased
  * identically on both sides; every query is deterministically ordered.
  */
object Registry {

  type Q = (SparkSession, String) => DataFrame

  /** q_dedup_latest: latest-per-key dedup (SURVEY §2.4 D1) + inner join +
    * group agg — the slice-0 end-to-end query. Keeps the max-l_linenumber
    * line of each order, joins orders, aggregates by priority.
    */
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
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
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
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       round(avg(l_quantity), 4) AS avg_qty
      |FROM latest JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_dedup_latest" -> dedupLatest
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_latest" -> dedupLatestSql
  )
}
