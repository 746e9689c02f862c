package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Tiling

/** Round-6 registry extension, sixth batch — the statistical-inference
  * family a data-quality/experimentation pipeline runs on aggregates:
  *
  *  - closed-form OLS regression (normal equations + Cramer's rule: the
  *    data pass is ONE nine-sum aggregation; the 3×3 solve is exact
  *    128-bit integer arithmetic both engines replay),
  *  - Welch's unequal-variance t-test (Welch, Biometrika 1947) from
  *    exact integer moments,
  *  - the Gini concentration coefficient from distributed exact ranks.
  *
  * All three follow the engine's exactness doctrine: every corpus-sized
  * sum is exact integer (milli/percent/dollar fixed-point), doubles
  * appear only in final scalar formulas written with the SAME operation
  * order in both engines, and each result crosses the hash gate through
  * one documented rounding step.
  */
object Stats {

  type Q = Registry.Q

  // ------------------------------------------------------ closed-form OLS
  /** OLS of lineitem price (whole dollars) on quantity and discount (%)
    * by the normal equations: XᵀX and Xᵀy are NINE exact integer sums —
    * one grouping-free map-side-combinable aggregation over the fact
    * table, the ONLY data pass — and the 3×3 system solves by Cramer's
    * rule evaluated in decimal(38,0) (Spark) / HUGEINT (DuckDB): exact
    * 128-bit integers, bounded by n·(Σq²)(Σd²) ≈ 10²³ ≪ 10³⁸. Doubles
    * appear only as the final numerator/denominator casts, identical
    * IEEE ops both engines. The 100 TB regression recipe: no feature
    * matrix is ever materialized, no iterative solver — d features cost
    * d² combinable sums and a driver-free d³ scalar expression.
    */
  private val olsQ: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("d"),
      floor(col("l_extendedprice")).cast("long").as("y"))
    val stats = li.agg(
      count(lit(1)).as("s00"), sum(col("q")).as("s01"),
      sum(col("d")).as("s02"), sum(col("q") * col("q")).as("s11"),
      sum(col("q") * col("d")).as("s12"),
      sum(col("d") * col("d")).as("s22"),
      sum(col("y")).as("t0"), sum(col("q") * col("y")).as("t1"),
      sum(col("d") * col("y")).as("t2"))
    val dec = Seq("s00", "s01", "s02", "s11", "s12", "s22",
      "t0", "t1", "t2")
      .map(c => s"CAST($c AS DECIMAL(38,0)) AS $c")
    stats.selectExpr("CAST(s00 AS BIGINT) AS n" +: dec: _*)
      .selectExpr(
        "n",
        // det(XᵀX) and the three Cramer numerators, exact integers
        """(s00*(s11*s22 - s12*s12) - s01*(s01*s22 - s12*s02)
          | + s02*(s01*s12 - s11*s02)) AS det""".stripMargin,
        """(t0*(s11*s22 - s12*s12) - s01*(t1*s22 - s12*t2)
          | + s02*(t1*s12 - s11*t2)) AS nb0""".stripMargin,
        """(s00*(t1*s22 - s12*t2) - t0*(s01*s22 - s12*s02)
          | + s02*(s01*t2 - t1*s02)) AS nb1""".stripMargin,
        """(s00*(s11*t2 - t1*s12) - s01*(s01*t2 - t1*s02)
          | + t0*(s01*s12 - s11*s02)) AS nb2""".stripMargin)
      .selectExpr("n",
        "round(CAST(nb0 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_intercept",
        "round(CAST(nb1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_quantity",
        "round(CAST(nb2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_discount")
  }
  private val olsSql =
    """WITH f AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
      |         CAST(floor(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS s00,
      |         CAST(sum(q) AS HUGEINT) AS s01,
      |         CAST(sum(d) AS HUGEINT) AS s02,
      |         CAST(sum(q*q) AS HUGEINT) AS s11,
      |         CAST(sum(q*d) AS HUGEINT) AS s12,
      |         CAST(sum(d*d) AS HUGEINT) AS s22,
      |         CAST(sum(y) AS HUGEINT) AS t0,
      |         CAST(sum(q*y) AS HUGEINT) AS t1,
      |         CAST(sum(d*y) AS HUGEINT) AS t2
      |  FROM f),
      |c AS (
      |  SELECT s00,
      |    (s00*(s11*s22 - s12*s12) - s01*(s01*s22 - s12*s02)
      |     + s02*(s01*s12 - s11*s02)) AS det,
      |    (t0*(s11*s22 - s12*s12) - s01*(t1*s22 - s12*t2)
      |     + s02*(t1*s12 - s11*t2)) AS nb0,
      |    (s00*(t1*s22 - s12*t2) - t0*(s01*s22 - s12*s02)
      |     + s02*(s01*t2 - t1*s02)) AS nb1,
      |    (s00*(s11*t2 - t1*s12) - s01*(s01*t2 - t1*s02)
      |     + t0*(s01*s12 - s11*s02)) AS nb2
      |  FROM m)
      |SELECT CAST(s00 AS BIGINT) AS n,
      |  round(CAST(nb0 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_intercept,
      |  round(CAST(nb1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_quantity,
      |  round(CAST(nb2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_discount
      |FROM c""".stripMargin

  // -------------------------------------------------------- Welch t-test
  /** Welch's unequal-variance two-sample t-test (Welch, Biometrika 1947)
    * between the purchase and view cohorts' event values: per cohort ONE
    * combinable aggregation of (n, Σv, Σv²) over exact milli-unit
    * integers; mean, variance, t and the Welch–Satterthwaite df are
    * scalar double formulas written with identical operation order in
    * both engines (the q_cuped precedent); the decision boolean
    * (|t| > 1.96) is what a data-quality gate consumes. The two 1-row
    * moment frames cross-join — nothing corpus-sized moves.
    */
  private val ttestQ: Q = (s, dir) => {
    def cohort(t: String, sfx: String) =
      Tables.events(s, dir).filter(col("event_type") === t)
        .select(floor(col("value") * 1000 + 0.5).cast("long").as("v"))
        .agg(count(lit(1)).as(s"n$sfx"), sum(col("v")).as(s"s1$sfx"),
          sum(col("v") * col("v")).as(s"s2$sfx"))
    cohort("purchase", "a").crossJoin(cohort("view", "b")) // 1-row frames
      .selectExpr("na", "nb",
        "CAST(s1a AS DOUBLE) / na AS ma", "CAST(s1b AS DOUBLE) / nb AS mb",
        """(CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
          |  / na) / (na - 1) AS va""".stripMargin,
        """(CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
          |  / nb) / (nb - 1) AS vb""".stripMargin)
      .selectExpr("na", "nb", "ma", "mb",
        "va / na + vb / nb AS se2", "va", "vb")
      .selectExpr(
        "na AS n_a", "nb AS n_b",
        "round(ma, 4) AS mean_a_milli", "round(mb, 4) AS mean_b_milli",
        "round((ma - mb) / sqrt(se2), 4) AS t_stat",
        """round(se2 * se2 / ((va / na) * (va / na) / (na - 1)
          |  + (vb / nb) * (vb / nb) / (nb - 1)), 2) AS df""".stripMargin,
        "abs((ma - mb) / sqrt(se2)) > 1.96 AS significant")
  }
  private val ttestSql =
    """WITH a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS na,
      |         CAST(sum(v) AS BIGINT) AS s1a,
      |         CAST(sum(v*v) AS BIGINT) AS s2a
      |  FROM (SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      |        FROM events WHERE event_type = 'purchase')),
      |b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nb,
      |         CAST(sum(v) AS BIGINT) AS s1b,
      |         CAST(sum(v*v) AS BIGINT) AS s2b
      |  FROM (SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      |        FROM events WHERE event_type = 'view')),
      |m AS (
      |  SELECT na, nb,
      |    CAST(s1a AS DOUBLE) / na AS ma, CAST(s1b AS DOUBLE) / nb AS mb,
      |    (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
      |      / na) / (na - 1) AS va,
      |    (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
      |      / nb) / (nb - 1) AS vb
      |  FROM a, b),
      |m2 AS (SELECT na, nb, ma, mb, va, vb,
      |       va / na + vb / nb AS se2 FROM m)
      |SELECT na AS n_a, nb AS n_b,
      |  round(ma, 4) AS mean_a_milli, round(mb, 4) AS mean_b_milli,
      |  round((ma - mb) / sqrt(se2), 4) AS t_stat,
      |  round(se2 * se2 / ((va / na) * (va / na) / (na - 1)
      |    + (vb / nb) * (vb / nb) / (nb - 1)), 2) AS df,
      |  abs((ma - mb) / sqrt(se2)) > 1.96 AS significant
      |FROM m2""".stripMargin

  // ---------------------------------------------------------------- Gini
  /** Gini concentration coefficient of per-customer revenue (whole
    * dollars), G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted
    * revenues — the inequality audit a domain-mixture owner reads before
    * reweighting (is 90% of the corpus coming from 1% of sources?).
    * Ranks come from [[Tiling.withGlobalRank]] (bucketed prefix offsets —
    * no SinglePartition window at any size; the oracle pays the global
    * row_number instead), the moment sums combine map-side, and the
    * result is exact integer basis points: the difference is taken
    * BEFORE the ×10⁴ so every intermediate stays ≪ 2⁶³ (headroom
    * documented: ~10¹⁸ at sf0.1 sums — decimal(38,0) is the swap at
    * 100× that).
    */
  private val giniQ: Q = (s, dir) => {
    val rev = Tables.orders(s, dir)
      .select(col("o_custkey"),
        floor(col("o_totalprice")).cast("long").as("xd"))
      .groupBy(col("o_custkey")).agg(sum(col("xd")).as("x"))
    val (ranked, n) = Tiling.withGlobalRank(rev, col("x"),
      Seq(col("x"), col("o_custkey")), "r0")
    ranked
      .agg(sum(col("x")).as("s0"),
        sum((col("r0") + 1L) * col("x")).as("s1"))
      .select(lit(n).as("n"), col("s0").as("total_dollars"),
        expr(s"(2 * s1 - ${n + 1} * s0) * 10000 div (${n} * s0)")
          .as("gini_bp"))
  }
  private val giniSql =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
      |           AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT)
      |    AS i FROM rev),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s0,
      |         CAST(sum(i * x) AS BIGINT) AS s1
      |  FROM r)
      |SELECT n, s0 AS total_dollars,
      |       (2 * s1 - (n + 1) * s0) * 10000 // (n * s0) AS gini_bp
      |FROM m""".stripMargin

  // ------------------------------------------------------------ registry

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_ols_closed", olsQ, Some(olsSql)),
    ("q_ab_ttest", ttestQ, Some(ttestSql)),
    ("q_gini", giniQ, Some(giniSql)))

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
