package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{TextOps, Tiling}

/** Round-6 registry extension, eighth batch — the model-evaluation and
  * model-training primitives a curation pipeline runs around its
  * classifiers:
  *
  *  - confusion matrix + precision/recall/F1 (exact integer ppm),
  *  - calibration/reliability deciles (predicted score vs realized
  *    positive rate per bin),
  *  - one-way ANOVA F (Fisher) across event cohorts,
  *  - a regression decision stump — one exact boosting-iteration split
  *    search over an aggregated candidate array.
  *
  * "Model" here is the engine's deterministic hashed linear scorer (the
  * q_quality_classifier construction — md5-derived weights both engines
  * reproduce); "label" is the document's language field. Same
  * conventions as [[Registry]]: exact integer arithmetic everywhere,
  * doubles only in final formulas with identical operation order.
  */
object Evaluation {

  type Q = Registry.Q

  /** The q_quality_classifier score (wsum div n_tokens micro-units) +
    * the binary label (lang = 'en') per document — shared by the
    * confusion and calibration queries.
    */
  private def scored(s: org.apache.spark.sql.SparkSession,
                     dir: String): org.apache.spark.sql.DataFrame = {
    def w(t: Column): Column =
      (conv(substring(md5(concat(lit("qw|"), t)), 1, 4), 16, 10)
        .cast("long") - 32768L)
    val toks = TextOps.tokens(col("text"))
    Registry.spread(Tables.documents(s, dir))
      .select(col("doc_id"), (col("lang") === "en").as("label"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + w(t)).as("wsum"))
      .select(col("doc_id"), col("label"),
        expr("wsum div n_tokens").as("score_micro"))
  }
  private[queries] def scoredForSpec(s: org.apache.spark.sql.SparkSession,
                                     dir: String) = scored(s, dir)

  private[queries] val scoredSql =
    """tok AS (
      |  SELECT doc_id, lang = 'en' AS label,
      |         unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents),
      |wt AS (
      |  SELECT doc_id, label,
      |    CAST(CAST('0x' || substr(md5('qw|' || t), 1, 4) AS INTEGER)
      |      AS BIGINT) - 32768 AS w
      |  FROM tok),
      |scored AS (
      |  SELECT doc_id, label,
      |         CAST(sum(w) AS BIGINT) // CAST(count(*) AS BIGINT)
      |           AS score_micro
      |  FROM wt GROUP BY doc_id, label)""".stripMargin

  // ------------------------------------------------------ confusion matrix
  /** Confusion matrix of the hashed scorer (positive ⇔ score > 0)
    * against the language label, with precision/recall/F1 in EXACT
    * integer ppm (F1 computed on the ppm values — exact, no float).
    * One combinable aggregation over the scored corpus; the whole
    * evaluation is a single row regardless of corpus size.
    */
  private val confusionQ: Q = (s, dir) => {
    scored(s, dir)
      .agg(
        sum(when(col("label") && col("score_micro") > 0, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(!col("label") && col("score_micro") > 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("label") && !(col("score_micro") > 0), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(!col("label") && !(col("score_micro") > 0), 1L)
          .otherwise(0L)).as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        "tp * 1000000 div (tp + fp) AS precision_ppm",
        "tp * 1000000 div (tp + fn) AS recall_ppm")
      .selectExpr("tp", "fp", "fn", "tn", "precision_ppm", "recall_ppm",
        """CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
          |ELSE 2 * precision_ppm * recall_ppm
          |     div (precision_ppm + recall_ppm) END AS f1_ppm""".stripMargin)
  }
  private val confusionSql =
    s"""WITH $scoredSql,
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN label AND score_micro > 0
       |             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN NOT label AND score_micro > 0
       |             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN label AND NOT (score_micro > 0)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT label AND NOT (score_micro > 0)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scored),
       |pr AS (
       |  SELECT tp, fp, fn, tn,
       |         tp * 1000000 // (tp + fp) AS precision_ppm,
       |         tp * 1000000 // (tp + fn) AS recall_ppm
       |  FROM c)
       |SELECT tp, fp, fn, tn, precision_ppm, recall_ppm,
       |  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
       |       ELSE 2 * precision_ppm * recall_ppm
       |            // (precision_ppm + recall_ppm) END AS f1_ppm
       |FROM pr""".stripMargin

  // -------------------------------------------------- calibration deciles
  /** Reliability diagram data: exact global score deciles
    * ([[Tiling.ntileDistributed]] — no SinglePartition window), per
    * decile the mean predicted score (exact micro integer division) and
    * the realized positive rate (exact ppm). The drift audit run after
    * every re-train: a well-calibrated scorer's positive rate rises
    * monotonically with the decile.
    */
  private val calibrationQ: Q = (s, dir) => {
    val d = Tiling.ntileDistributed(scored(s, dir), 10,
      col("score_micro"), Seq(col("score_micro"), col("doc_id")), "decile")
    d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("score_micro")).as("ssum"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
      .selectExpr("decile", "n",
        "ssum div n AS mean_score_micro",
        "pos * 1000000 div n AS positive_ppm")
      .orderBy(col("decile"))
  }
  private val calibrationSql =
    s"""WITH $scoredSql,
       |d AS (
       |  SELECT label, score_micro,
       |         ntile(10) OVER (ORDER BY score_micro, doc_id) AS decile
       |  FROM scored)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(score_micro) AS BIGINT) // CAST(count(*) AS BIGINT)
       |         AS mean_score_micro,
       |       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |         * 1000000 // CAST(count(*) AS BIGINT) AS positive_ppm
       |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  // -------------------------------------------------------------- ROC AUC
  /** ROC AUC of the hashed scorer against the language label, computed
    * EXACTLY (integer ppm) as the tie-aware Mann–Whitney U statistic:
    * rank every document by (score, doc_id) with
    * [[Tiling.withGlobalRank]] (no SinglePartition window), replace tied
    * scores by their midrank — tracked in HALF-units (2·midrank =
    * min+max of the tie block's ranks) so everything stays integer —
    * then AUC = (Σ₊ 2·midrank − n₊(n₊+1)) / (2·n₊·n₋). The
    * threshold-free companion of q_confusion: one rank pass + two
    * combinable aggregations, nothing corpus-sized after the rank.
    */
  private val aucQ: Q = (s, dir) => {
    val (ranked, _) = Tiling.withGlobalRank(scored(s, dir),
      col("score_micro"), Seq(col("score_micro"), col("doc_id")), "r0")
    // per tied-score block: 2·midrank = min(rank1) + max(rank1)
    val blocks = ranked.select(col("label"), col("score_micro"),
        (col("r0") + 1L).as("r1"))
      .groupBy(col("score_micro"))
      .agg((min(col("r1")) + max(col("r1"))).as("mid2"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n"))
    blocks.agg(
        sum(col("pos") * col("mid2")).as("possum2"),
        sum(col("pos")).as("np"),
        sum(col("n") - col("pos")).as("nn"))
      .selectExpr("np AS n_pos", "nn AS n_neg",
        """(possum2 - np * (np + 1)) * 1000000
          | div (2 * np * nn) AS auc_ppm""".stripMargin)
  }
  private val aucSql =
    s"""WITH $scoredSql,
       |r AS (
       |  SELECT label, score_micro,
       |         CAST(row_number() OVER (ORDER BY score_micro, doc_id)
       |           AS BIGINT) AS r1
       |  FROM scored),
       |b AS (
       |  SELECT score_micro, min(r1) + max(r1) AS mid2,
       |         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |           AS pos,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM r GROUP BY score_micro),
       |m AS (
       |  SELECT CAST(sum(pos * mid2) AS BIGINT) AS possum2,
       |         CAST(sum(pos) AS BIGINT) AS np,
       |         CAST(sum(n - pos) AS BIGINT) AS nn
       |  FROM b)
       |SELECT np AS n_pos, nn AS n_neg,
       |       (possum2 - np * (np + 1)) * 1000000
       |        // (2 * np * nn) AS auc_ppm
       |FROM m""".stripMargin

  // ------------------------------------------------------- one-way ANOVA
  /** One-way ANOVA F across the five event cohorts (value in exact
    * milli-units): the data pass is ONE conditional aggregation pivoting
    * the five cohorts' (n, Σv, Σv²) into a single row of exact integers;
    * SSB/SSW and F are then a fixed-order double formula — no
    * nondeterministic float summation ever happens (summing per-group
    * doubles across an unordered 5-row frame would be). The grouped
    * sibling of q_ab_ttest.
    */
  private val anovaQ: Q = (s, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val v = Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
    val aggs = types.flatMap { t =>
      Seq(sum(when(col("event_type") === t, 1L).otherwise(0L))
        .as(s"n_$t"),
        sum(when(col("event_type") === t, col("v")).otherwise(0L))
          .as(s"s1_$t"),
        sum(when(col("event_type") === t, col("v") * col("v"))
          .otherwise(0L)).as(s"s2_$t"))
    }
    val gm = types.map(t => s"CAST(s1_$t AS DOUBLE)").mkString(" + ")
    val nAll = types.map(t => s"n_$t").mkString(" + ")
    val ssb = types.map(t =>
      s"CAST(s1_$t AS DOUBLE) * s1_$t / n_$t").mkString(" + ")
    val ssw = types.map(t =>
      s"(CAST(s2_$t AS DOUBLE) - CAST(s1_$t AS DOUBLE) * s1_$t / n_$t)")
      .mkString(" + ")
    v.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"$nAll AS n",
        s"($ssb) - ($gm) * (($gm) / ($nAll)) AS ssb",
        s"$ssw AS ssw")
      .selectExpr("n",
        // mean squares, not raw SS: rounding a ~10^14 double is below
        // the type's resolution and the engines' round() implementations
        // diverge there (BigDecimal vs float multiply) — normalized
        // magnitudes keep round(x, 2) exact in both
        "round(ssb / 4, 2) AS ms_between",
        "round(ssw / (n - 5), 2) AS ms_within",
        "round((ssb / 4) / (ssw / (n - 5)), 4) AS f_stat")
  }
  private val anovaSql = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val moments = types.flatMap { t =>
      Seq(
        s"""CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
           | AS BIGINT) AS n_$t""".stripMargin,
        s"""CAST(sum(CASE WHEN event_type = '$t' THEN v ELSE 0 END)
           | AS BIGINT) AS s1_$t""".stripMargin,
        s"""CAST(sum(CASE WHEN event_type = '$t' THEN v * v ELSE 0 END)
           | AS BIGINT) AS s2_$t""".stripMargin)
    }.mkString(",\n    ")
    val gm = types.map(t => s"CAST(s1_$t AS DOUBLE)").mkString(" + ")
    val nAll = types.map(t => s"n_$t").mkString(" + ")
    val ssb = types.map(t =>
      s"CAST(s1_$t AS DOUBLE) * s1_$t / n_$t").mkString(" + ")
    val ssw = types.map(t =>
      s"(CAST(s2_$t AS DOUBLE) - CAST(s1_$t AS DOUBLE) * s1_$t / n_$t)")
      .mkString(" + ")
    s"""WITH f AS (
       |  SELECT event_type,
       |         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
       |  FROM events),
       |m AS (
       |  SELECT
       |    $moments
       |  FROM f),
       |c AS (
       |  SELECT $nAll AS n,
       |    ($ssb) - ($gm) * (($gm) / ($nAll)) AS ssb,
       |    $ssw AS ssw
       |  FROM m)
       |SELECT n, round(ssb / 4, 2) AS ms_between,
       |       round(ssw / (n - 5), 2) AS ms_within,
       |       round((ssb / 4) / (ssw / (n - 5)), 4) AS f_stat
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------- decision stump
  /** Regression decision stump (the CART/boosting split-search
    * iteration — Breiman et al. 1984 lineage): best ≤-threshold split
    * of lineitem price (whole dollars) on quantity, maximizing the
    * variance-reduction score S_L²/n_L + S_R²/n_R. The data pass is one
    * 50-group (quantity, n, Σy) aggregation; the candidate search runs
    * over that bounded aggregate — 49 rows through a TakeOrdered —
    * never over rows. Gain score is the only double (identical
    * expression text both engines; ties break toward the smaller
    * threshold); child means are exact micro integers. At 100 TB a
    * d-feature stump is d such aggregations — the split search stays
    * metadata-scale.
    */
  private val stumpQ: Q = (s, dir) => {
    val g = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val packed = g.agg(
      sort_array(collect_list(struct(col("q"), col("n"), col("sy"))))
        .as("a"),
      sum(col("n")).as("tn"), sum(col("sy")).as("ts"))
    packed
      .select(col("tn"), col("ts"), explode(expr(
        """transform(sequence(1, size(a) - 1), i -> named_struct(
          |  'q', element_at(a, i).q,
          |  'nl', aggregate(slice(a, 1, i), 0L, (acc, x) -> acc + x.n),
          |  'sl', aggregate(slice(a, 1, i), 0L, (acc, x) -> acc + x.sy)))
          |""".stripMargin)).as("c"))
      .selectExpr("c.q AS split_q", "c.nl AS n_left", "tn - c.nl AS n_right",
        "c.sl AS sl", "ts - c.sl AS sr")
      .selectExpr("split_q", "n_left", "n_right",
        "sl * 1000000 div n_left AS mean_left_micro",
        "sr * 1000000 div n_right AS mean_right_micro",
        """CAST(sl AS DOUBLE) * sl / n_left
          | + CAST(sr AS DOUBLE) * sr / n_right AS v""".stripMargin)
      .orderBy(col("v").desc, col("split_q"))
      .limit(1)
      .selectExpr("split_q", "n_left", "n_right",
        "mean_left_micro", "mean_right_micro",
        // per-row gain: raw v is ~10^13 where round(x, 4) is below
        // double resolution and engine round()s diverge — the
        // normalized score is the comparable number anyway
        "round(v / (n_left + n_right), 4) AS gain_score")
  }
  private val stumpSql =
    """WITH f AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |         CAST(floor(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (
      |  SELECT q, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS sy
      |  FROM f GROUP BY q),
      |p AS (
      |  SELECT q,
      |    CAST(sum(n) OVER (ORDER BY q) AS BIGINT) AS nl,
      |    CAST(sum(sy) OVER (ORDER BY q) AS BIGINT) AS sl
      |  FROM g),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
      |               CAST(sum(sy) AS BIGINT) AS ts FROM g),
      |cand AS (
      |  SELECT q AS split_q, nl AS n_left, tn - nl AS n_right,
      |         sl, ts - sl AS sr
      |  FROM p, tot WHERE tn - nl > 0),
      |sc AS (
      |  SELECT split_q, n_left, n_right,
      |         sl * 1000000 // n_left AS mean_left_micro,
      |         sr * 1000000 // n_right AS mean_right_micro,
      |         CAST(sl AS DOUBLE) * sl / n_left
      |          + CAST(sr AS DOUBLE) * sr / n_right AS v
      |  FROM cand)
      |SELECT split_q, n_left, n_right, mean_left_micro, mean_right_micro,
      |       round(v / (n_left + n_right), 4) AS gain_score
      |FROM sc ORDER BY v DESC, split_q LIMIT 1""".stripMargin

  // ------------------------------------------------------------ registry

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_confusion", confusionQ, Some(confusionSql)),
    ("q_calibration", calibrationQ, Some(calibrationSql)),
    ("q_auc", aucQ, Some(aucSql)),
    ("q_anova_f", anovaQ, Some(anovaSql)),
    ("q_decision_stump", stumpQ, Some(stumpSql)))

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
