package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops._

/** Round-2 registry extension — operators widening SURVEY §2 coverage
  * beyond the round-1 set: reshape (unpivot, grouping sets), non-equi
  * joins (range/band, null-safe), ordered-set aggregates (collect),
  * analytic windows (percent_rank/cume_dist), statistics, regex family,
  * edit-distance blocking, generators (date series), histograms,
  * union-by-name, TF-IDF scoring, stream-stream joins and stratified
  * sampling.
  *
  * Same conventions as [[Registry]]: identical aliases both sides,
  * deterministic total-order ORDER BY, exact decimal sums for money.
  */
object Extended {

  type Q = Registry.Q

  /** Exact decimal sum → double (same contract as Registry.decSum). */
  private def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")
  private def decSumSql(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  private def spread(df: DataFrame): DataFrame = Registry.spread(df)

  // ------------------------------------------------------------- reshape

  /** Unpivot / melt (wide→long): the inverse of the reference's pivot
    * (`usda_branded_food_data_pipeline.py:98-105`) — measures become
    * (measure, val) rows, then rolled up. Narrow op: no shuffle until the
    * aggregate; the unpivot itself is a generator projection.
    */
  private val unpivotQ: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_tax"), col("l_discount")),
        "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("cnt"), decSum(col("val")).as("sum_val"))
      .orderBy(col("measure"))
  }
  private val unpivotSql =
    s"""WITH long AS (
       |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
       |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
       |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
       |SELECT measure, count(*) AS cnt, ${decSumSql("val")} AS sum_val
       |FROM long GROUP BY measure ORDER BY measure""".stripMargin

  /** GROUPING SETS — the general form of rollup/cube (explicit set list).
    * One shuffle: Spark expands the sets map-side then aggregates once.
    */
  private val groupingSetsQ: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), decSum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag_g"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status_g"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("flag_g"), col("status_g"))
  }
  private val groupingSetsSql =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag_g,
       |       coalesce(l_linestatus, 'ALL') AS status_g,
       |       count(*) AS cnt, ${decSumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY flag_g, status_g""".stripMargin

  /** Union-by-name with missing-column null-fill (schema-evolution union
    * — heterogeneous sources into one corpus, a standard training-data
    * ingestion step).
    */
  private val unionByNameQ: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("ent_key"), col("c_name").as("name"),
      col("c_acctbal").as("bal"), lit("customer").as("src"))
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").as("ent_key"), col("s_name").as("name"),
      lit("supplier").as("src"))
    c.unionByName(sup, allowMissingColumns = true)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("cnt"), decSum(col("bal")).as("sum_bal"))
      .orderBy(col("src"))
  }
  private val unionByNameSql =
    s"""WITH u AS (
       |  SELECT c_custkey AS ent_key, c_name AS name, c_acctbal AS bal,
       |         'customer' AS src FROM customer
       |  UNION ALL BY NAME
       |  SELECT s_suppkey AS ent_key, s_name AS name, 'supplier' AS src
       |  FROM supplier)
       |SELECT src, count(*) AS cnt, ${decSumSql("bal")} AS sum_bal
       |FROM u GROUP BY src ORDER BY src""".stripMargin

  // ------------------------------------------------------ non-equi joins

  /** Range (band) join: fact rows matched to a broadcast tier table on a
    * value interval — BroadcastNestedLoopJoin, the right physical plan
    * for a tiny non-equi dim at any fact scale.
    */
  private val rangeJoinQ: Q = (s, dir) => {
    val tiers = s.createDataFrame(Seq(
      ("T1_budget", 0.0, 100000.0),
      ("T2_mid", 100000.0, 250000.0),
      ("T3_high", 250000.0, 1000000.0)))
      .toDF("tier", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("cnt"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("tier"))
  }
  private val rangeJoinSql =
    s"""WITH tiers(tier, lo, hi) AS (VALUES
       |  ('T1_budget', 0.0, 100000.0),
       |  ('T2_mid', 100000.0, 250000.0),
       |  ('T3_high', 250000.0, 1000000.0))
       |SELECT tier, count(*) AS cnt, ${decSumSql("o_totalprice")} AS sum_price
       |FROM orders JOIN tiers
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY tier ORDER BY tier""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): null keys
    * match each other — the semantics pandas `merge` gives NaN keys in
    * the reference's nutrient merge would need on a nullable key.
    */
  private val nullSafeJoinQ: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val a = li.groupBy(expr("nullif(l_returnflag, 'N')").as("k"))
      .agg(count(lit(1)).as("cnt_a")).as("a")
    val b = li.filter(col("l_quantity") > 25)
      .groupBy(expr("nullif(l_returnflag, 'N')").as("k"))
      .agg(count(lit(1)).as("cnt_b")).as("b")
    a.join(b, col("a.k") <=> col("b.k"))
      .select(col("a.k").as("k"), col("cnt_a"), col("cnt_b"))
      .orderBy(asc_nulls_first("k"))
  }
  private val nullSafeJoinSql =
    """WITH a AS (
      |  SELECT nullif(l_returnflag, 'N') AS k, count(*) AS cnt_a
      |  FROM lineitem GROUP BY 1),
      |b AS (
      |  SELECT nullif(l_returnflag, 'N') AS k, count(*) AS cnt_b
      |  FROM lineitem WHERE l_quantity > 25 GROUP BY 1)
      |SELECT a.k AS k, cnt_a, cnt_b
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |ORDER BY k NULLS FIRST""".stripMargin

  // -------------------------------------------- aggregates / windows

  /** Ordered-set collection: collect_set + sort + join to a stable string
    * (collection order is engine-dependent; sorting restores a canonical
    * form — the only safe way to emit collected lists at scale).
    */
  private val collectListQ: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        array_join(array_sort(collect_set(col("l_linestatus"))), ",")
          .as("statuses"),
        array_join(
          transform(slice(array_sort(collect_set(col("l_suppkey"))), 1, 5),
            x => x.cast("string")), ",").as("first_supps"))
      .orderBy(col("l_returnflag"))
  }
  private val collectListSql =
    """SELECT l_returnflag, count(*) AS cnt,
      |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      |  array_to_string(list_transform(list_sort(list(DISTINCT l_suppkey))[1:5],
      |    x -> CAST(x AS VARCHAR)), ',') AS first_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Analytic ranks: percent_rank + cume_dist (rank-based → deterministic
    * under ties, unlike row_number without a total order).
    */
  private val percentRankQ: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    Tables.customer(s, dir).select(
      col("c_custkey"), col("c_mktsegment"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("c_custkey"))
  }
  private val percentRankSql =
    """SELECT c_custkey, c_mktsegment,
      |  round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS pr,
      |  round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Statistics aggregates: sample stddev/variance/correlation/covariance
    * per group (single shuffle; Spark merges partial co-moments
    * map-side).
    */
  private val statsAggQ: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      .orderBy(col("l_returnflag"))
  }
  private val statsAggSql =
    """SELECT l_returnflag, count(*) AS cnt,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Fixed-width histogram binning (floor arithmetic — identical IEEE ops
    * on both engines; the scalable form of width_bucket).
    */
  private val histogramQ: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("lo_price"),
        max(col("o_totalprice")).as("hi_price"))
      .orderBy(col("bucket"))
  }
  private val histogramSql =
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
      |       count(*) AS cnt, min(o_totalprice) AS lo_price,
      |       max(o_totalprice) AS hi_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ------------------------------------------------- scalars / generators

  /** Regex family: extract / replace-all / match-filter flag. */
  private val regexQ: Q = (s, dir) => {
    Tables.part(s, dir).select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
      regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_norm"),
      col("p_name").rlike("g(ear|izmo)").as("is_g"))
      .orderBy(col("p_partkey"))
  }
  private val regexSql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^[a-z]+', 0) AS first_word,
      |  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_norm,
      |  regexp_matches(p_name, 'g(ear|izmo)') AS is_g
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Edit-distance blocking (fuzzy-dup candidate pairs over a distinct
    * key domain — the classic small-domain pass of fuzzy dedup; the
    * distinct() collapses the fact table before the quadratic step, and
    * [[TextOps.editDistancePairs]] guards the domain cardinality so the
    * O(n²) contract is explicit).
    */
  private val editDistanceQ: Q = (s, dir) =>
    TextOps.editDistancePairs(Tables.part(s, dir), "p_brand")
      .orderBy(col("b1"), col("b2"))
  private val editDistanceSql =
    """WITH b AS (SELECT DISTINCT p_brand FROM part)
      |SELECT x.p_brand AS b1, y.p_brand AS b2
      |FROM b x, b y
      |WHERE x.p_brand < y.p_brand AND levenshtein(x.p_brand, y.p_brand) <= 1
      |ORDER BY b1, b2""".stripMargin

  /** Date-series generator (sequence+explode) LEFT-joined to facts — the
    * gap-filling calendar-spine pattern; empty days keep cnt 0 / null sum.
    *
    * Scale shape: the fact table pre-aggregates per day FIRST (one
    * keyed shuffle, map-side combine), then the tiny per-day result
    * broadcast-joins to the spine — joining the raw fact table to the
    * spine would shuffle the whole fact table on a 90-key join.
    */
  private val dateSeriesQ: Q = (s, dir) => {
    val days = s.range(1).select(
      explode(expr(
        "sequence(date'1995-01-01', date'1995-03-31', interval 1 day)"))
        .as("day"))
    val perDay = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("day_cnt"),
        decSum(col("o_totalprice")).as("day_sum"))
    days.join(broadcast(perDay), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("day_cnt"), lit(0L)).as("cnt"),
        col("day_sum").as("sum_price"))
      .orderBy(col("day"))
  }
  private val dateSeriesSql =
    s"""WITH days AS (
       |  SELECT CAST(unnest(generate_series(DATE '1995-01-01',
       |    DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day)
       |SELECT day, count(o_orderkey) AS cnt,
       |       ${decSumSql("o_totalprice")} AS sum_price
       |FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = day
       |GROUP BY day ORDER BY day""".stripMargin

  // ------------------------------------------------------- text / scoring

  /** TF-IDF: per-(doc, term) score over the corpus, global top-20 — the
    * token stream explodes ONCE into the tf aggregate; document frequency
    * is derived from tf itself (rows per token = docs containing it), so
    * no second pass over the corpus. Doc count broadcasts as a scalar;
    * TakeOrdered cuts the final k.
    */
  private val tfidfQ: Q = (s, dir) => {
    val tf = spread(Tables.documents(s, dir))
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log(col("n").cast("double") / col("df").cast("double")), 4)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("tok"))
      .limit(20)
  }
  private val tfidfSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, tok,
      |       round(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS score
      |FROM tf JOIN df USING (tok) CROSS JOIN n
      |ORDER BY score DESC, doc_id, tok LIMIT 20""".stripMargin

  // ------------------------------------------------ streaming / sampling

  /** Stream-stream interval join (click→purchase attribution within
    * 30 min), drained via AvailableNow then rolled up per user. Oracle =
    * the equivalent batch self-join.
    */
  private val streamJoinQ: Q = (s, dir) => {
    graft.streaming.EventStream
      .runStreamJoin(s, Registry.stagedStreamDir(s, dir))
      .orderBy(col("user_id"))
  }
  private val streamJoinSql =
    """SELECT c.user_id AS user_id, count(*) AS pairs
      |FROM events c JOIN events p
      |  ON c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.user_id = c.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Hash-deterministic exact-N sample: md5-ordered draw — the
    * cross-engine-reproducible form of q_exact_sample (any engine with
    * md5 draws the same rows, so this one HAS an oracle).
    */
  private val hashSampleQ: Q = (s, dir) => {
    Sampling.hashSample(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey")),
      500,
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")))
  }
  private val hashSampleSql =
    """SELECT md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS h,
      |       l_orderkey, l_linenumber, l_partkey, l_suppkey
      |FROM lineitem
      |ORDER BY h, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 500""".stripMargin

  /** Stratified (per-key Bernoulli) sampling — `sampleBy` with fixed
    * fractions and seed. The per-stratum sample COUNT is engine-local
    * RNG, so the emitted row carries what the driver CAN check: the
    * exact stratum population (oracle recomputes it) and a 5σ-binomial
    * concentration boolean the oracle states as `true` — a sampler that
    * ignores its fractions (or a fraction map typo) lands tens of σ out
    * and flips the column, failing the hash gate. The ±fraction
    * closeness itself is also property-locked in ExtendedSpec. The
    * HEADLINE stratified form is q_stratified_exact below (exact-N per
    * stratum AND value-level oracled).
    */
  private val stratifiedSampleQ: Q = (s, dir) => {
    val fractions = Map("A" -> 0.10, "N" -> 0.05, "R" -> 0.20)
    val li = Tables.lineitem(s, dir)
    val sampled = li.stat.sampleBy("l_returnflag", fractions, 42L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("sampled"))
    val f = element_at(typedLit(fractions), col("l_returnflag"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_stratum"))
      .join(sampled, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n_stratum"),
        (abs(coalesce(col("sampled"), lit(0L)) - f * col("n_stratum")) <=
          lit(5.0) * sqrt(f * (lit(1.0) - f) * col("n_stratum")) + lit(1.0))
          .as("within_5_sigma"))
      .orderBy(col("l_returnflag"))
  }
  private val stratifiedSampleSql =
    """SELECT l_returnflag, count(*) AS n_stratum, TRUE AS within_5_sigma
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact-N-per-stratum hash-deterministic sample
    * ([[graft.ops.Sampling.stratifiedHashSample]]): unlike
    * q_stratified_sample's Bernoulli `sampleBy` (approximate-N,
    * engine-local RNG), this draws exactly `n` rows per stratum from the
    * md5 order, so any engine with md5 reproduces the draw — fully
    * oracled. One shuffle on the stratum key; the rank window is
    * partitioned per stratum, never global.
    */
  private val stratifiedExactQ: Q = (s, dir) => {
    Sampling.stratifiedHashSample(
      Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
      50, col("l_returnflag"),
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")))
      .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
  }
  private val stratifiedExactSql =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |         row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)),
      |                    l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
      |  FROM lineitem)
      |WHERE rn <= 50
      |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Weighted sample without replacement (Efraimidis–Spirtakis A-Res,
    * [[graft.ops.Sampling.weightedHashSample]]): md5-derived uniform draw
    * + pow(u, 1/w) score, n largest win — engine-portable arithmetic, so
    * the weighted selection itself is oracled (DuckDB rebuilds the
    * identical scores; '0x' || hex cast stands in for Spark's conv).
    */
  private val weightedSampleQ: Q = (s, dir) => {
    Sampling.weightedHashSample(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity")),
      200, col("l_quantity"),
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
  }
  private val weightedSampleSql =
    """WITH scored AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |    pow((('0x' || substring(md5(concat_ws('|', l_orderkey, l_linenumber,
      |           l_partkey, l_suppkey)), 1, 8))::BIGINT + 0.5) / 4294967296.0,
      |        1.0 / CAST(l_quantity AS DOUBLE)) AS ares
      |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity > 0),
      |top AS (
      |  SELECT * FROM scored
      |  ORDER BY ares DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |  LIMIT 200)
      |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |FROM top ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  // ------------------------------------------------- windows (batch 2)

  /** Navigation window functions: lead + first/last/nth over the full
    * partition frame (deterministic: the window order ends in the unique
    * o_orderkey).
    */
  private val windowLeadQ: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_orderkey")).over(wFull).as("first_ok"),
      last(col("o_orderkey")).over(wFull).as("last_ok"),
      nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"))
      .orderBy(col("o_orderkey"))
  }
  private val windowLeadSql =
    """SELECT o_orderkey, o_custkey,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_orderkey) OVER wf AS first_ok,
      |  last_value(o_orderkey) OVER wf AS last_ok,
      |  nth_value(o_orderkey, 2) OVER wf AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** RANGE-interval window frame: per-user trailing-1-hour rolling count
    * and exact decimal sum (the value-range frame, not a row count — ties
    * at the boundary land identically in both engines).
    */
  private val rollingRangeQ: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
          .as("sum_1h"))
      .orderBy(col("event_id"))
  }
  private val rollingRangeSql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS cnt_1h,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Deterministic mode (argmax aggregate): max_by over a (count, value)
    * struct — lexicographic struct ordering gives the built-in a total
    * order, where bare `mode()` breaks ties arbitrarily.
    */
  private val modeQ: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderpriority"),
          struct(col("cnt"), col("o_orderpriority"))).as("mode_priority"),
        max(col("cnt")).as("mode_cnt"))
      .orderBy(col("o_orderstatus"))
  }
  private val modeSql =
    """WITH counts AS (
      |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      |  FROM orders GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |    ORDER BY cnt DESC, o_orderpriority DESC) AS rn FROM counts)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_cnt
      |FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  /** Dynamic pivot: values inferred from the data (one extra distinct
    * collect vs the explicit-values form — acceptable for low-cardinality
    * pivot keys, which is the only regime pivot makes sense in anyway).
    */
  private val pivotDynamicQ: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag")
      .agg(count(lit(1)))
      .orderBy(col("l_linestatus"))
  }
  private val pivotDynamicSql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS "A",
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS "N",
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS "R"
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ------------------------------------- clustering / staged sources

  /** Near-dup clustering: connected components over the verified
    * embedding near-dup pairs — each vector labeled with its cluster
    * representative (min id). Oracle = DuckDB recursive-CTE transitive
    * closure over the same (oracle-verified) pair set.
    */
  private val connectedComponentsQ: Q = (s, dir) => {
    val pairs = VectorOps.nearDupCosine(
      Tables.embeddings(s, dir), "vec_id", "embedding", "label", 0.35)
    Dedup.connectedComponentsAuto(pairs, "id_a", "id_b")
      .orderBy(col("id"))
  }
  private val connectedComponentsSql =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE round(${Registry.cosineSql("a.embedding", "b.embedding")}, 4) >= 0.35),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id)
       |SELECT id, min(r) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Fixed-iteration PageRank ([[graft.ops.PageRank]]) over the
    * supplier↔part bipartite graph from lineitem, symmetrized so no
    * node dangles. EXACT integer micro-rank arithmetic makes the result
    * bit-identical across engines — the oracle replays all 5 iterations
    * with DuckDB integer division and hash-compares every rank.
    * Node ids are namespaced (2·suppkey even, 2·partkey+1 odd) so the
    * two key spaces can share one graph.
    */
  private val pagerankQ: Q = (s, dir) => {
    val base = Tables.lineitem(s, dir)
      .select((col("l_suppkey").cast("long") * 2).as("src"),
        (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    // both orientations; even/odd namespaces are disjoint → no dedup
    val edges = base.union(
      base.select(col("dst").as("src"), col("src").as("dst")))
    graft.ops.PageRank.pageRank(edges, "src", "dst", iterations = 5)
      .orderBy(col("node"))
  }
  private val pagerankSql = {
    val teleport = 1000000L * (1000L - 850L) / 1000L
    val iters = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    $teleport + (850 * CAST(sum(r.pr // e.out_deg) AS BIGINT)) // 1000
         |      AS pr
         |  FROM ed e JOIN r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT CAST(2 * l_suppkey AS BIGINT) AS src,
       |         CAST(2 * l_partkey + 1 AS BIGINT) AS dst
       |  FROM lineitem),
       |edges AS (SELECT src, dst FROM base
       |          UNION ALL SELECT dst, src FROM base),
       |deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
       |ed AS (SELECT e.src, e.dst, d.out_deg
       |       FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$iters
       |SELECT node, pr FROM r5 ORDER BY node""".stripMargin
  }

  /** The 100 TB contingency path, driver-oracled like everything else
    * ([[graft.ops.PageRank.pageRankBucketed]]): 3 iterations over the
    * supplier↔part graph restricted to l_suppkey ≤ 200 (same exact
    * integer micro-rank arithmetic as q_pagerank, just a smaller graph —
    * the bucketed path pays a table write per iteration, which is its
    * honest cost), both sides read from co-bucketed tables so the
    * per-iteration join plans with zero Exchange (PlanSpec-proven on
    * [[graft.ops.PageRank.bucketedIteration]]). The oracle replays all 3
    * iterations; bit-equality with the DuckDB replay proves the bucketed
    * loop computes the SAME fixpoint arithmetic as the broadcast loop.
    * Staged tables are ownership-tagged and re-staged per run (bounded:
    * 4 tables, overwritten in place).
    */
  private val pagerankBucketedQ: Q = (s, dir) => {
    val base = Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 200)
      .select((col("l_suppkey").cast("long") * 2).as("src"),
        (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val edges = base.union(
      base.select(col("dst").as("src"), col("src").as("dst")))
    // eager localCheckpoint: materialize the (node-count-sized) result
    // BEFORE dropping the staged tables it lazily reads — the query then
    // leaves the warehouse clean for the next JVM (a fresh in-memory
    // catalog can't overwrite a dead JVM's leftover managed-table dirs)
    val ranked = graft.ops.PageRank.pageRankBucketed(s, edges, "src", "dst",
        iterations = 3, namePrefix = "graft_prb_q", buckets = 8)
      .localCheckpoint()
    graft.ops.PageRank.dropBucketedTables(s, "graft_prb_q")
    ranked.orderBy(col("node"))
  }
  private val pagerankBucketedSql = {
    val teleport = 1000000L * (1000L - 850L) / 1000L
    val iters = (1 to 3).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    $teleport + (850 * CAST(sum(r.pr // e.out_deg) AS BIGINT)) // 1000
         |      AS pr
         |  FROM ed e JOIN r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT CAST(2 * l_suppkey AS BIGINT) AS src,
       |         CAST(2 * l_partkey + 1 AS BIGINT) AS dst
       |  FROM lineitem WHERE l_suppkey <= 200),
       |edges AS (SELECT src, dst FROM base
       |          UNION ALL SELECT dst, src FROM base),
       |deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
       |ed AS (SELECT e.src, e.dst, d.out_deg
       |       FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$iters
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }

  /** SCD Type-2 dimension build ([[graft.ops.Scd.scd2]]): customer
    * order-status history collapsed into versioned validity intervals.
    * (o_orderdate, o_orderkey) is the total order — orderdate alone has
    * ties, the §7-documented nondeterminism trap.
    */
  private val scd2Q: Q = (s, dir) => {
    graft.ops.Scd.scd2(Tables.orders(s, dir), Seq("o_custkey"),
        Seq("o_orderdate", "o_orderkey"), Seq("o_orderstatus"))
      .orderBy(col("o_custkey"), col("version"))
  }
  private val scd2Sql =
    """WITH marked AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |    CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |v AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
      |    lead(o_orderdate) OVER w2 AS valid_to,
      |    CAST(row_number() OVER w2 AS INT) AS version
      |  FROM marked WHERE chg = 1
      |  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT o_custkey, o_orderstatus, valid_from, valid_to, version,
      |       valid_to IS NULL AS is_current
      |FROM v ORDER BY o_custkey, version""".stripMargin

  /** Per-process staged copies of events as JSON-lines / lineitem as CSV
    * — source-format coverage: the engine must read more than parquet.
    * Timestamps travel as unix micros (format-proof); doubles round-trip
    * via shortest-repr printing.
    */
  private def stageJson(s: SparkSession, dir: String): String =
    Staging.cached(s"json:$dir") { tmp =>
      Tables.events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(4).write.mode("overwrite").json(tmp.toString)
      tmp.toString
    }
  private def stageCsv(s: SparkSession, dir: String): String =
    Staging.cached(s"csv:$dir") { tmp =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
        .coalesce(4).write.mode("overwrite").option("header", "true").csv(tmp.toString)
      tmp.toString
    }

  /** JSON-lines source with explicit schema → same aggregate the parquet
    * path would produce (the oracle reads the original parquet).
    */
  private val jsonSourceQ: Q = (s, dir) => {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    s.read.schema(schema).json(stageJson(s, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("sum_value"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))
      .orderBy(col("event_type"))
  }
  private val jsonSourceSql =
    s"""SELECT event_type, count(*) AS cnt, ${decSumSql("value")} AS sum_value,
       |       min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CSV source (header + explicit schema) → exact decimal revenue
    * rollup; proves the CSV reader round-trips doubles bit-exactly.
    */
  private val csvSourceQ: Q = (s, dir) => {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_returnflag", StringType)))
    s.read.schema(schema).option("header", "true").csv(stageCsv(s, dir))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))
  }
  private val csvSourceSql =
    """SELECT l_returnflag, count(*) AS cnt,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------- SQL text / ORC / sketches

  /** Full SQL-text entry point: the engine's `spark.sql` surface over
    * registered views. The query text is dialect-shared — the SAME string
    * runs on Spark and DuckDB (the oracle), which is the strongest
    * possible parity statement for the SQL API.
    */
  private val sqlTextShared =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1996-01-01'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
  private val sqlTextQ: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(sqlTextShared)
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): tree-depth histogram over a
    * floor-division parent edge set — the SAME SQL text runs in both
    * engines (dialect-shared like q_sql_text). Depth ≤ 10, far under the
    * recursion-level limit.
    */
  private val recursiveCteShared =
    """WITH RECURSIVE edges AS (
      |  SELECT o_orderkey AS child,
      |         CAST(floor(o_orderkey / 2.0) AS BIGINT) AS parent
      |  FROM orders WHERE o_orderkey BETWEEN 2 AND 1024),
      |d(n, depth) AS (
      |  SELECT CAST(1 AS BIGINT), 0
      |  UNION ALL
      |  SELECT e.child, d.depth + 1 FROM edges e JOIN d ON e.parent = d.n)
      |SELECT depth, count(*) AS cnt FROM d GROUP BY depth ORDER BY depth""".stripMargin
  private val recursiveCteQ: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(recursiveCteShared)
  }

  /** Correlated LATERAL subquery: per-nation argmax customer — the
    * lateral top-1 idiom, dialect-shared text.
    */
  private val lateralShared =
    """SELECT n.n_name, x.c_name, x.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 1) x
      |ORDER BY n_name""".stripMargin
  private val lateralQ: Q = (s, dir) => {
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(lateralShared)
  }

  /** Multiset set-ops: EXCEPT ALL / INTERSECT ALL preserve duplicate
    * counts (bag semantics) — the DF `exceptAll`/`intersectAll` forms.
    */
  private val exceptAllQ: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      .exceptAll(li.filter(col("l_linestatus") === "F").select(col("l_orderkey")))
      .orderBy(col("l_orderkey"))
  }
  private val exceptAllSql =
    """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |EXCEPT ALL
      |SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
      |ORDER BY l_orderkey""".stripMargin
  private val intersectAllQ: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      .intersectAll(li.filter(col("l_quantity") > 25).select(col("l_orderkey")))
      .orderBy(col("l_orderkey"))
  }
  private val intersectAllSql =
    """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |INTERSECT ALL
      |SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
      |ORDER BY l_orderkey""".stripMargin

  /** ORC source roundtrip (Spark's second first-class columnar format):
    * write → read → exact aggregate vs the parquet-side oracle.
    */
  private def stageOrc(s: SparkSession, dir: String): String =
    Staging.cached(s"orc:$dir") { tmp =>
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_retailprice"))
        .coalesce(4).write.mode("overwrite").orc(tmp.toString)
      tmp.toString
    }
  private val orcSourceQ: Q = (s, dir) => {
    s.read.orc(stageOrc(s, dir))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), sum(col("p_size")).as("sum_size"),
        decSum(col("p_retailprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }
  private val orcSourceSql =
    s"""SELECT p_brand, count(*) AS cnt,
       |       CAST(sum(p_size) AS BIGINT) AS sum_size,
       |       ${decSumSql("p_retailprice")} AS sum_price
       |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Mergeable HLL sketches (Apache DataSketches): per-group sketch →
    * union → estimate. THE scale pattern for distinct counts: sketches
    * merge across partitions/groups/days without re-scanning. The
    * estimate is engine-local, so the row carries the exact distinct
    * (oracle-recomputable) plus a bound boolean the oracle states as a
    * constant — the union path drifting past 5% flips it and fails the
    * hash gate.
    */
  private val hllUnionQ: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val est = li
      .groupBy(col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"),
        count(lit(1)).as("cnt"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .cast("long").as("est"),
        sum(col("cnt")).as("total_rows"))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    est.crossJoin(exact) // 1 row × 1 row
      .select(col("exact_orders"), col("total_rows"),
        (abs(col("est") - col("exact_orders")).cast("double")
          / col("exact_orders") <= 0.05).as("union_within_5pct"))
  }
  private val hllUnionSql =
    """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |       CAST(count(*) AS BIGINT) AS total_rows,
      |       TRUE AS union_within_5pct
      |FROM lineitem""".stripMargin

  /** Forward as-of join: each order matched to the user's EARLIEST event
    * at or after the order date (complement of q_asof_join's
    * last-before; same union+window shape, descending scan).
    */
  private val asofForwardQ: Q = (s, dir) => {
    AsOf.joinFirstAfter(
      Tables.orders(s, dir), Tables.events(s, dir),
      leftKey = "o_custkey", rightKey = "user_id",
      leftTimeUs = unix_micros(col("o_orderdate").cast("timestamp")),
      rightTimeUs = unix_micros(col("ts")),
      rightPayload = Seq("event_id"), rightTieBreak = "event_id")
      .select(col("o_orderkey"), col("__match.event_id").as("next_event_id"))
      .orderBy(col("o_orderkey"))
  }
  private val asofForwardSql =
    """WITH pairs AS (
      |  SELECT o_orderkey, event_id,
      |         row_number() OVER (PARTITION BY o_orderkey
      |           ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
      |  FROM orders JOIN events
      |    ON user_id = o_custkey AND epoch_us(ts) >= epoch_us(o_orderdate))
      |SELECT o.o_orderkey, p.event_id AS next_event_id
      |FROM orders o LEFT JOIN pairs p ON o.o_orderkey = p.o_orderkey AND p.rn = 1
      |ORDER BY o.o_orderkey""".stripMargin

  /** Date formatting + month arithmetic: pattern formatting, month-end,
    * add_months (both engines clamp month-end overflow identically).
    */
  private val dateFormatQ: Q = (s, dir) => {
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      last_day(to_date(col("o_orderdate"))).as("month_end"),
      add_months(to_date(col("o_orderdate")), 3).as("plus3m"))
      .orderBy(col("o_orderkey"))
  }
  private val dateFormatSql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Null-preserving generator: explode_outer keeps a null row for
    * parts whose filtered word list is empty (an inner explode would
    * silently drop them — the LEFT-JOIN-shaped generator). DuckDB
    * mirrors by padding empty lists with [NULL].
    */
  private val explodeOuterQ: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(col("p_partkey"),
        explode_outer(
          filter(split(col("p_type"), " "), w => w >= "m")).as("w"))
      .orderBy(col("p_partkey"), col("w"))
  }
  private val explodeOuterSql =
    """WITH t AS (
      |  SELECT p_partkey,
      |         list_filter(string_split(p_type, ' '), w -> w >= 'm') AS arr
      |  FROM part)
      |SELECT p_partkey,
      |  unnest(CASE WHEN len(arr) = 0 THEN [CAST(NULL AS VARCHAR)]
      |              ELSE arr END) AS w
      |FROM t ORDER BY p_partkey, w""".stripMargin

  /** Generator with position: posexplode → (pos, token), first 3 tokens
    * per document (DuckDB mirrors via zipped parallel unnests).
    */
  private val posexplodeQ: Q = (s, dir) => {
    spread(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), col("tok"), (col("pos0") + 1).as("pos"))
      .filter(col("pos") <= 3)
      .orderBy(col("doc_id"), col("pos"))
  }
  private val posexplodeSql =
    """SELECT doc_id, tok, pos FROM (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok,
      |    unnest(generate_series(1, len(string_split_regex(trim(text), '\s+')))) AS pos
      |  FROM documents)
      |WHERE pos <= 3 ORDER BY doc_id, pos""".stripMargin

  /** MAP-typed column family: construct a per-user event_type→count map
    * (map_from_entries ∘ collect), then read it back through element_at /
    * map_keys / map_values. The oracle checks the VALUES the map yields,
    * not the container encoding.
    */
  private val mapFamilyQ: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
        .as("m"))
      .select(col("user_id"),
        element_at(col("m"), "click").as("clicks"),
        size(map_keys(col("m"))).as("n_types"),
        aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x)
          .as("total"))
      .orderBy(col("user_id"))
  }
  private val mapFamilySql =
    """WITH per AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id,
      |  max(CASE WHEN event_type = 'click' THEN cnt END) AS clicks,
      |  CAST(count(*) AS INT) AS n_types,
      |  CAST(sum(cnt) AS BIGINT) AS total
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------- end-to-end corpus pipeline

  /** The LLM-training-data path as ONE lazy plan: score quality →
    * language-gate → exact-dedup (keep min doc id per content
    * fingerprint, counting collapsed dups) → hash-deterministic corpus
    * sample. Every stage is oracle-checked end-to-end — the composition
    * statement the individual per-stage queries can't make.
    *
    * Scale shape: scoring/fingerprinting are map-side expression work;
    * the dedup is one keyed shuffle with map-side combine; the sample cut
    * is TakeOrdered on the fingerprint (pseudo-random, engine-portable).
    */
  private val corpusPipelineQ: Q = (s, dir) => {
    val t = col("text")
    val scored = spread(Tables.documents(s, dir)).select(
      col("doc_id"),
      TextOps.langId(t).as("detected"),
      TextOps.qualityPoints(t).as("q_points"),
      TextOps.tokenCount(t).as("n_tokens"),
      TextOps.fingerprint(t).as("fp"))
    val gated = scored
      .filter(col("q_points") >= 4 && col("detected") =!= "und")
    // all text-derived columns are constant within a fingerprint group —
    // max() is just the deterministic pick
    gated.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        max(col("detected")).as("lang_det"),
        max(col("q_points")).as("q_points"),
        max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_dups"))
      .orderBy(col("fp"))
      .limit(100)
      .select(col("doc_id"), col("fp"), col("lang_det"), col("q_points"),
        col("n_tokens"), col("n_dups"))
  }
  private val corpusPipelineSql = {
    def hits(lang: String): String = {
      val words = TextOps.stopwords(lang).map(w => s"'$w'").mkString(", ")
      s"len(list_intersect(toks, [$words]))"
    }
    val stopList = TextOps.stopwords.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, length(text) AS n_chars,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_tok,
       |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
       |  list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
       |  FROM documents),
       |sc AS (SELECT doc_id, text, n_tok,
       |  ${TextOps.qualityPointsSql("n_chars", "n_tok", "punct",
            s"len(list_intersect(toks, [$stopList]))")} AS q_points,
       |  CASE WHEN ${hits("fr")} > 0 AND ${hits("fr")} >= ${hits("es")}
       |            AND ${hits("fr")} >= ${hits("en")} AND ${hits("fr")} >= ${hits("de")} THEN 'fr'
       |       WHEN ${hits("es")} > 0 AND ${hits("es")} >= ${hits("en")}
       |            AND ${hits("es")} >= ${hits("de")} THEN 'es'
       |       WHEN ${hits("en")} > 0 AND ${hits("en")} >= ${hits("de")} THEN 'en'
       |       WHEN ${hits("de")} > 0 THEN 'de'
       |       ELSE 'und' END AS detected
       |  FROM t),
       |gated AS (SELECT * FROM sc WHERE q_points >= 4 AND detected <> 'und'),
       |dedup AS (SELECT md5(text) AS fp, min(doc_id) AS doc_id,
       |  max(detected) AS lang_det, max(q_points) AS q_points,
       |  max(n_tok) AS n_tokens, count(*) AS n_dups
       |  FROM gated GROUP BY md5(text))
       |SELECT doc_id, fp, lang_det, q_points, n_tokens, n_dups
       |FROM dedup ORDER BY fp LIMIT 100""".stripMargin
  }

  // ------------------------------------- exact correlation / regression

  /** Pearson correlation + least-squares slope/intercept per group,
    * computed from EXACT decimal co-moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * instead of `corr()`'s streaming double moments: decimal addition is
    * associative, so the co-moments — and therefore the final doubles —
    * are bit-identical at ANY partitioning/merge order. That's what makes
    * a distributed corr hash-match a single-threaded oracle, and it's the
    * scale-safe formulation (one map-side-combinable agg pass, O(groups)
    * output). The closing arithmetic is plain IEEE doubles on identical
    * inputs — deterministic on both engines without rounding.
    *
    * Oracle note: DuckDB's int128-backed DECIMAL→DOUBLE cast is not
    * correctly rounded (1-ulp error observed); the SQL routes the cast
    * through VARCHAR (decimal printed exactly, strtod rounds correctly)
    * to match Spark's BigDecimal.doubleValue.
    */
  private val corrStatsQ: Q = (s, dir) => {
    val x = col("l_quantity").cast(DecimalType(18, 4))
    val y = col("l_extendedprice").cast(DecimalType(18, 4))
    def d(c: String) = col(c).cast("double")
    val m = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val nd = d("n")
    val cov = nd * d("sxy") - d("sx") * d("sy")
    val vx = nd * d("sxx") - d("sx") * d("sx")
    val vy = nd * d("syy") - d("sy") * d("sy")
    m.select(col("l_returnflag"), col("n"),
        (cov / sqrt(vx * vy)).as("corr_qty_price"),
        (cov / vx).as("slope"),
        ((d("sy") - cov / vx * d("sx")) / nd).as("intercept"))
      .orderBy(col("l_returnflag"))
  }
  private val corrStatsSql =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
      |             CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
      |             CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) *
      |             CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy)
      |    / sqrt((CAST(n AS DOUBLE)*sxx - sx*sx) * (CAST(n AS DOUBLE)*syy - sy*sy))
      |    AS corr_qty_price,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx) AS slope,
      |  (sy - (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx) * sx)
      |    / CAST(n AS DOUBLE) AS intercept
      |FROM m ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------- running distinct count

  /** Running distinct-count over an ordered stream WITHOUT a growing
    * collect_set window: mark each (user, event_type)'s first occurrence
    * with row_number()=1, then running-sum the flags. Two window passes
    * with O(1) state per row — the shape that survives long histories,
    * vs `size(collect_set() OVER w)` whose per-row state grows with
    * cardinality. Ordering is by unique event_id, so ties can't diverge.
    */
  private val runningDistinctQ: Q = (s, dir) => {
    val first = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one explicit hash(user_id) exchange serves BOTH windows: hash(user)
    // satisfies the (user, event_type) clustering (subset rule), so the
    // per-type pass only re-sorts — without this, each window spec plans
    // its own full shuffle
    Tables.events(s, dir)
      .repartition(col("user_id"))
      .withColumn("is_first",
        when(row_number().over(first) === 1, 1L).otherwise(0L))
      .select(col("event_id"), col("user_id"),
        sum(col("is_first")).over(run).as("n_types_seen"))
      .orderBy(col("event_id"))
  }
  private val runningDistinctSql =
    """WITH f AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY event_id) = 1
      |         THEN 1 ELSE 0 END AS is_first
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_types_seen
      |FROM f ORDER BY event_id""".stripMargin

  // --------------------------------------------- run-length encoding

  /** Run-length encoding of per-user event-type streaks (gaps-and-islands
    * with an equality predicate): a lag-mismatch flag starts a new run,
    * its running sum numbers the runs, and a single groupBy collapses each
    * run to one row. Three shuffle-free-after-the-first-sort window passes
    * over the same (user_id, event_id) ordering — Catalyst reuses one
    * Exchange+Sort for all of them.
    */
  private val rleEventsQ: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("brk",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_seq", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("run_seq"), col("event_type"))
      .agg(count(lit(1)).as("run_len"),
        min(col("event_id")).as("first_event"))
      .filter(col("run_len") >= 2)
      .orderBy(col("user_id"), col("run_seq"))
  }
  private val rleEventsSql =
    """WITH b AS (
      |  SELECT user_id, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |r AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS run_seq
      |  FROM b)
      |SELECT user_id, run_seq, event_type,
      |  count(*) AS run_len, min(event_id) AS first_event
      |FROM r GROUP BY user_id, run_seq, event_type
      |HAVING count(*) >= 2
      |ORDER BY user_id, run_seq""".stripMargin

  // ------------------------------------------------------------- registry

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_unpivot", unpivotQ, Some(unpivotSql)),
    ("q_grouping_sets", groupingSetsQ, Some(groupingSetsSql)),
    ("q_union_by_name", unionByNameQ, Some(unionByNameSql)),
    ("q_range_join", rangeJoinQ, Some(rangeJoinSql)),
    ("q_null_safe_join", nullSafeJoinQ, Some(nullSafeJoinSql)),
    ("q_collect_list", collectListQ, Some(collectListSql)),
    ("q_percent_rank", percentRankQ, Some(percentRankSql)),
    ("q_stats_agg", statsAggQ, Some(statsAggSql)),
    ("q_histogram", histogramQ, Some(histogramSql)),
    ("q_regex_extract", regexQ, Some(regexSql)),
    ("q_edit_distance", editDistanceQ, Some(editDistanceSql)),
    ("q_date_series", dateSeriesQ, Some(dateSeriesSql)),
    ("q_tfidf", tfidfQ, Some(tfidfSql)),
    ("q_stream_join", streamJoinQ, Some(streamJoinSql)),
    ("q_stratified_sample", stratifiedSampleQ, Some(stratifiedSampleSql)),
    ("q_stratified_exact", stratifiedExactQ, Some(stratifiedExactSql)),
    ("q_weighted_sample", weightedSampleQ, Some(weightedSampleSql)),
    ("q_window_lead", windowLeadQ, Some(windowLeadSql)),
    ("q_rolling_range", rollingRangeQ, Some(rollingRangeSql)),
    ("q_mode", modeQ, Some(modeSql)),
    ("q_pivot_dynamic", pivotDynamicQ, Some(pivotDynamicSql)),
    ("q_connected_components", connectedComponentsQ, Some(connectedComponentsSql)),
    ("q_pagerank", pagerankQ, Some(pagerankSql)),
    ("q_pagerank_bucketed", pagerankBucketedQ, Some(pagerankBucketedSql)),
    ("q_scd2", scd2Q, Some(scd2Sql)),
    ("q_json_source", jsonSourceQ, Some(jsonSourceSql)),
    ("q_csv_source", csvSourceQ, Some(csvSourceSql)),
    ("q_sql_text", sqlTextQ, Some(sqlTextShared)),
    ("q_orc_source", orcSourceQ, Some(orcSourceSql)),
    ("q_hll_union", hllUnionQ, Some(hllUnionSql)),
    ("q_hash_sample", hashSampleQ, Some(hashSampleSql)),
    ("q_corpus_pipeline", corpusPipelineQ, Some(corpusPipelineSql)),
    ("q_posexplode", posexplodeQ, Some(posexplodeSql)),
    ("q_map_family", mapFamilyQ, Some(mapFamilySql)),
    ("q_asof_forward", asofForwardQ, Some(asofForwardSql)),
    ("q_date_format", dateFormatQ, Some(dateFormatSql)),
    ("q_explode_outer", explodeOuterQ, Some(explodeOuterSql)),
    ("q_recursive_cte", recursiveCteQ, Some(recursiveCteShared)),
    ("q_lateral", lateralQ, Some(lateralShared)),
    ("q_except_all", exceptAllQ, Some(exceptAllSql)),
    ("q_intersect_all", intersectAllQ, Some(intersectAllSql)),
    ("q_corr_stats", corrStatsQ, Some(corrStatsSql)),
    ("q_running_distinct", runningDistinctQ, Some(runningDistinctSql)),
    ("q_rle_events", rleEventsQ, Some(rleEventsSql)))

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
