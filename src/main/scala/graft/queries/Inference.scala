package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextOps

/** Round-6 registry extension, ninth batch — distribution comparison and
  * information-theoretic feature selection:
  *
  *  - exact two-sample Kolmogorov–Smirnov test: the supremum CDF gap as
  *    an exact integer rational over bucketed distributed prefix sums
  *    (the sort-free sibling of the skyline sweep),
  *  - mutual-information feature ranking over hashed token buckets —
  *    the information-theoretic completion of the selection family
  *    (DSIR = likelihood ratios, PMI = co-occurrence, this = MI against
  *    a supervision label).
  *
  * Same conventions as [[Registry]]: exact integers everywhere, one
  * documented micro-rounding per log term, identical aliases both
  * engines.
  */
object Inference {

  type Q = Registry.Q

  // ------------------------------------------- Kolmogorov–Smirnov test
  /** Exact two-sample KS between the purchase and view cohorts' event
    * values (milli-units): D = sup |F₁ − F₂| evaluated at every distinct
    * value as the exact integer |c₁·n₂ − c₂·n₁| (c = cumulative counts),
    * so D_ppm is exact and the argmax value is reported. Cumulative
    * counts come from the engine's bucketed-prefix pattern (value
    * range-bucketed off a 1-row stats collect, per-bucket running sums,
    * ≤64-row per-bucket totals folded into broadcast offset maps — the
    * [[graft.ops.Skyline]] carry and [[graft.ops.Tiling]] offset idiom)
    * — no SinglePartition window at any size. The decision boolean uses
    * the large-sample 5% critical value 1.358·√((n₁+n₂)/(n₁n₂)).
    */
  private val ksTestQ: Q = (s, dir) => {
    val v = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(floor(col("value") * 1000 + 0.5).cast("long").as("v"),
        (col("event_type") === "purchase").as("isA"))
    val g = v.groupBy(col("v"))
      .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("a1"),
        sum(when(!col("isA"), 1L).otherwise(0L)).as("a2"))
    val Array(stats) = g
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n")).collect()
    require(stats.getLong(2) > 0, "ks: empty cohorts")
    val (mn, mx) = (stats.getLong(0).toDouble, stats.getLong(1).toDouble)
    val bucket: Column =
      if (mn == mx) lit(1L)
      else least(width_bucket(col("v").cast("double"), lit(mn), lit(mx),
        lit(64)), lit(64L))
    val wb = g.withColumn("__b", bucket)
    // per-bucket totals → prefix offsets for both cohorts (≤64 rows)
    val bt = wb.groupBy(col("__b"))
      .agg(sum(col("a1")).as("t1"), sum(col("a2")).as("t2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val off1 = bt.map(_._1).zip(bt.map(_._2).scanLeft(0L)(_ + _))
    val off2 = bt.map(_._1).zip(bt.map(_._3).scanLeft(0L)(_ + _))
    def mapLit(m: Seq[(Long, Long)]): Column =
      map(m.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = wb
      .withColumn("c1", element_at(mapLit(off1), col("__b")) +
        sum(col("a1")).over(w))
      .withColumn("c2", element_at(mapLit(off2), col("__b")) +
        sum(col("a2")).over(w))
    val n1 = bt.map(_._2).sum
    val n2 = bt.map(_._3).sum
    cum.select(col("v"),
        abs(col("c1") * lit(n2) - col("c2") * lit(n1)).as("dnum"))
      .agg(max(struct(col("dnum"), (-col("v")).as("nv"))).as("m"))
      .select(lit(n1).as("n_a"), lit(n2).as("n_b"),
        (-col("m.nv")).as("d_at_value"),
        expr(s"m.dnum * 1000000 div (${n1} * ${n2}L)").as("d_ppm"))
      .selectExpr("n_a", "n_b", "d_at_value", "d_ppm",
        s"""CAST(d_ppm AS DOUBLE) / 1000000.0 >
           | 1.358 * sqrt(CAST(${n1} + ${n2} AS DOUBLE)
           |   / (CAST(${n1} AS DOUBLE) * ${n2})) AS significant""".stripMargin)
  }
  private val ksTestSql =
    """WITH f AS (
      |  SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
      |         event_type = 'purchase' AS isA
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |g AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) AS a1,
      |    CAST(sum(CASE WHEN NOT isA THEN 1 ELSE 0 END) AS BIGINT) AS a2
      |  FROM f GROUP BY v),
      |n AS (
      |  SELECT CAST(sum(a1) AS BIGINT) AS n1, CAST(sum(a2) AS BIGINT) AS n2
      |  FROM g),
      |c AS (
      |  SELECT v,
      |    CAST(sum(a1) OVER (ORDER BY v) AS BIGINT) AS c1,
      |    CAST(sum(a2) OVER (ORDER BY v) AS BIGINT) AS c2
      |  FROM g),
      |d AS (
      |  SELECT v, abs(c1 * n2 - c2 * n1) AS dnum, n1, n2
      |  FROM c, n),
      |m AS (
      |  SELECT n1, n2, v AS d_at_value, dnum
      |  FROM d ORDER BY dnum DESC, v LIMIT 1)
      |SELECT n1 AS n_a, n2 AS n_b, d_at_value,
      |       dnum * 1000000 // (n1 * n2) AS d_ppm,
      |       CAST(dnum * 1000000 // (n1 * n2) AS DOUBLE) / 1000000.0 >
      |         1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
      |           / (CAST(n1 AS DOUBLE) * n2)) AS significant
      |FROM m""".stripMargin

  // --------------------------------------- mutual-information features
  /** Mutual information between each of 64 hashed token buckets
    * (presence per document — the DSIR bucket construction) and the
    * language label, in micro-nats: the four joint cells per bucket are
    * exact integers (n₁₁ from one combinable aggregation; the rest by
    * complement against the label totals), each cell's
    * (n/N)·ln(n·N/(r·c)) term is micro-rounded ONCE (the q_bigram_lm
    * discipline), and buckets rank by the exact rounded sum. The
    * supervised-selection completion of the family: DSIR ranks by
    * likelihood ratio, PMI by co-occurrence, this by information
    * against a label. Top-10 by (mi_micro desc, bucket).
    */
  private val miFeaturesQ: Q = (s, dir) => {
    val hex = "0123456789abcdef"
    def bucketOf(h: Column): Column =
      (((instr(lit(hex), substring(h, 1, 1)) - 1) * 16 +
        instr(lit(hex), substring(h, 2, 1)) - 1) % 64).cast("int")
    val docs = Registry.spread(Tables.documents(s, dir))
      .select(col("doc_id"), (col("lang") === "en").as("label"),
        col("text"))
    val pres = docs
      .select(col("doc_id"), col("label"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("label"),
        bucketOf(md5(col("tok"))).as("bucket"))
      .distinct()
    val tot = docs.agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("label"), 1L).otherwise(0L)).as("nn"))
    val cells = pres.groupBy(col("bucket"))
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("n11"),
        sum(when(!col("label"), 1L).otherwise(0L)).as("n10"))
      .crossJoin(broadcast(tot)) // 1-row label totals
      .selectExpr("bucket", "n11", "n10",
        "np - n11 AS n01", "nn - n10 AS n00", "np", "nn", "np + nn AS nt")
    def term(n: String, r: String, c: String): String =
      s"""CASE WHEN $n = 0 THEN 0L ELSE CAST(round(
         |  (CAST($n AS DOUBLE) / nt) * ln(CAST($n AS DOUBLE) * nt
         |    / (CAST($r AS DOUBLE) * $c)) * 1000000, 0) AS BIGINT)
         |END""".stripMargin
    cells.selectExpr("bucket", "n11", "n10", "n01", "n00",
        s"""${term("n11", "n11 + n10", "np")}
           | + ${term("n10", "n11 + n10", "nn")}
           | + ${term("n01", "n01 + n00", "np")}
           | + ${term("n00", "n01 + n00", "nn")} AS mi_micro""".stripMargin)
      .orderBy(col("mi_micro").desc, col("bucket"))
      .limit(10)
  }
  private val miFeaturesSql = {
    def term(n: String, r: String, c: String): String =
      s"""CASE WHEN $n = 0 THEN 0 ELSE CAST(round(
         |  (CAST($n AS DOUBLE) / nt) * ln(CAST($n AS DOUBLE) * nt
         |    / (CAST($r AS DOUBLE) * $c)) * 1000000, 0) AS BIGINT)
         |END""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, lang = 'en' AS label, text FROM documents),
       |pres AS (
       |  SELECT DISTINCT doc_id, label,
       |    CAST(((strpos('0123456789abcdef', substring(md5(tok), 1, 1)) - 1)
       |      * 16 + strpos('0123456789abcdef', substring(md5(tok), 2, 1))
       |      - 1) % 64 AS INTEGER) AS bucket
       |  FROM (SELECT doc_id, label,
       |          unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |        FROM d)),
       |tot AS (
       |  SELECT CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |           AS np,
       |         CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT)
       |           AS nn
       |  FROM d),
       |cells AS (
       |  SELECT bucket,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n10,
       |    np, nn, np - sum(CASE WHEN label THEN 1 ELSE 0 END) AS n01,
       |    nn - sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS n00,
       |    np + nn AS nt
       |  FROM pres, tot GROUP BY bucket, np, nn)
       |SELECT bucket, n11, n10, CAST(n01 AS BIGINT) AS n01,
       |       CAST(n00 AS BIGINT) AS n00,
       |  ${term("n11", "n11 + n10", "np")}
       |   + ${term("n10", "n11 + n10", "nn")}
       |   + ${term("n01", "n01 + n00", "np")}
       |   + ${term("n00", "n01 + n00", "nn")} AS mi_micro
       |FROM cells ORDER BY mi_micro DESC, bucket LIMIT 10""".stripMargin
  }

  // ------------------------------------------------------------ registry

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_ks_test", ksTestQ, Some(ksTestSql)),
    ("q_mi_features", miFeaturesQ, Some(miFeaturesSql)))

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
