package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Graph, Skyline, TextOps, Tiling}

/** Round-6 registry extension, fourth batch — frontier/topology operators
  * a curation pipeline runs for corpus diagnostics and layout planning:
  *
  *  - exact 2D Pareto skyline (Börzsönyi et al., ICDE 2001) without a
  *    global sort,
  *  - multi-source bounded BFS (k-hop blast radius over the shared
  *    [[SynthGraph]]),
  *  - n-gram novelty scoring (the "how much of this crawl is new text"
  *    dial — first-occurrence attribution per document),
  *  - KMV/theta distinct sketches with union/intersection estimates
  *    (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007 — the
  *    mergeable-set-operation family HLL union/intersect can't serve
  *    when DIFFERENCE-capable estimates are needed),
  *  - a zone-map pruning audit: the min/max file-skipping win of a
  *    sort-by-predicate-column layout vs insertion order — the number a
  *    100 TB table owner reads before paying for a rewrite.
  *
  * Same conventions as [[Registry]]: identical aliases both sides,
  * deterministic total-order ORDER BY, exact integer arithmetic (or a
  * single documented micro-rounding step) wherever a result crosses the
  * hash gate.
  */
object Frontier {

  type Q = Registry.Q

  // ------------------------------------------------------------ skyline
  /** Exact price/size Pareto frontier of `part` via [[Skyline.skyline2D]]
    * (range-bucketed sweep — no SinglePartition window, plan-locked).
    * Price is fixed to exact integer cents with floor(x·100 + 0.5) —
    * identical half-up arithmetic in both engines, the one rounding step
    * in the query. The oracle pays the textbook global-sort running max
    * instead.
    */
  private val skylineQ: Q = (s, dir) => {
    val pts = Tables.part(s, dir)
      .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      .select(floor(col("p_retailprice") * 100 + 0.5).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .groupBy(col("pc"), col("sz")).agg(count(lit(1)).as("n_dups"))
    Skyline.skyline2D(pts, "pc", "sz")
      .select(col("pc"), col("sz"), col("n_dups"))
      .orderBy(col("pc"))
  }
  private val skylineSql =
    """WITH pts AS (
      |  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc,
      |         CAST(p_size AS BIGINT) AS sz,
      |         CAST(count(*) AS BIGINT) AS n_dups
      |  FROM part
      |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT pc, sz, n_dups, max(sz) OVER (
      |    ORDER BY pc DESC, sz DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
      |  FROM pts)
      |SELECT pc, sz, n_dups FROM d
      |WHERE mx IS NULL OR sz > mx ORDER BY pc""".stripMargin

  // ----------------------------------------------------------- BFS hops
  /** Multi-source bounded BFS census over the shared [[SynthGraph]]:
    * sources are the ~1% of nodes ≡ 0 (mod 97), dist = min hops ≤ 3,
    * output is nodes-per-distance plus the unreached remainder (dist
    * −1). The oracle replays each level as a materialized CTE — the
    * exact level-synchronous arithmetic [[Graph.multiSourceBfs]] runs.
    */
  private val bfsHopsQ: Q = (s, dir) => {
    val raw = SynthGraph.edges(s, dir)
    // canonical edges materialize ONCE (localCheckpoint; cluster:
    // checkpoint) — the node census, the source filter, and the BFS's own
    // idempotent re-canonicalization all reuse the same 2-column frame
    // instead of re-deriving it from lineitem
    val e = raw
      .select(least(col("x"), col("y")).as("lo"),
        greatest(col("x"), col("y")).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("lo").as("node"))
      .union(e.select(col("hi").as("node"))).distinct()
    val sources = nodes.filter(col("node") % 97 === 0)
    val reached = Graph.multiSourceBfs(e, "lo", "hi", sources, maxHops = 3)
    val census = reached.groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"))
    val unreached = nodes.join(reached, Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).as("dist"), col("n_nodes"))
    census.unionByName(unreached)
      .filter(col("n_nodes") > 0)
      .select(col("dist").cast("int").as("dist"), col("n_nodes"))
      .orderBy(col("dist"))
  }
  private val bfsHopsSql = {
    def level(i: Int): String =
      s"""f$i AS MATERIALIZED (
         |  SELECT DISTINCT a.dst AS node
         |  FROM adj a JOIN f${i - 1} ON a.src = f${i - 1}.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v WHERE v.node = a.dst)),
         |v$i AS MATERIALIZED (
         |  SELECT * FROM v${i - 1} UNION ALL SELECT node, $i FROM f$i)""".stripMargin
    s"""WITH ${SynthGraph.rawSql},
       |e AS MATERIALIZED (
       |  SELECT DISTINCT least(x, y) AS lo, greatest(x, y) AS hi
       |  FROM raw WHERE x <> y),
       |adj AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM e
       |        UNION ALL SELECT hi, lo FROM e),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM adj),
       |v0 AS MATERIALIZED (
       |  SELECT node, 0 AS dist FROM nodes WHERE node % 97 = 0),
       |f0 AS MATERIALIZED (SELECT node FROM v0),
       |${(1 to 3).map(level).mkString(",\n")},
       |census AS (
       |  SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM v3 GROUP BY dist
       |  UNION ALL
       |  SELECT -1 AS dist, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM nodes n
       |  WHERE NOT EXISTS (SELECT 1 FROM v3 v WHERE v.node = n.node))
       |SELECT CAST(dist AS INTEGER) AS dist, n_nodes FROM census
       |WHERE n_nodes > 0 ORDER BY dist""".stripMargin
  }

  // ------------------------------------------------------ n-gram novelty
  /** Per-document n-gram novelty: the fraction (exact integer ppm) of a
    * doc's distinct 3-shingles that FIRST occur in it, first-occurrence
    * = min doc_id corpus-wide. The dial incremental crawls read before
    * ingesting a batch ("how much of this is new text"), and the
    * memorization-risk profile per document after. Scale shape: one
    * map-side-combinable min per shingle + one equi-join back + one
    * per-doc agg — no window, no cartesian. At 100 TB the join key would
    * be xxhash64(shingle) (8-byte wire, the q_simjoin_prefix trick); the
    * string key here keeps the oracle exact rather than
    * collision-empirical.
    */
  private val ngramNoveltyQ: Q = (s, dir) => {
    val ex = Registry.spread(Tables.documents(s, dir))
      .select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(col("text"), 3))).as("g"))
    val first = ex.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(first, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
      .orderBy(col("doc_id"))
  }
  private val ngramNoveltySql =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sets AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |         ELSE [array_to_string(toks[i:i+2], ' ')
      |               for i in range(1, len(toks) - 1)]
      |    END) AS ws FROM tok),
      |ex AS (SELECT doc_id, unnest(ws) AS g FROM sets),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g),
      |agg AS (
      |  SELECT ex.doc_id,
      |         CAST(count(*) AS BIGINT) AS n_grams,
      |         CAST(sum(CASE WHEN f.first_doc = ex.doc_id
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |  FROM ex JOIN f ON ex.g = f.g GROUP BY ex.doc_id)
      |SELECT doc_id, n_grams, n_novel,
      |       n_novel * 1000000 // n_grams AS novelty_ppm
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- KMV theta sketch
  /** KMV ("k minimum values" / theta) distinct sketches over two event
    * cohorts (purchase vs click user sets), with union and intersection
    * ESTIMATES beside the exact counts (Bar-Yossef et al., RANDOM 2002;
    * Beyer et al., SIGMOD 2007 — public literature). Unlike HLL
    * (q_hll_union/q_hll_intersect), KMV sketches compose through ANY set
    * expression: θ = the k-th smallest hash of the merged sketch defines
    * a uniform sample of the union, and |A∩B| ≈ (common hashes < θ)/θ.
    *
    * The hash is the first 8 md5 nibbles + 1 over 2³², so every h is an
    * EXACT power-of-two-denominator double both engines compute
    * bit-identically; a set smaller than k is carried exactly (est =
    * count). Scale shape: per cohort ONE distinct + ONE bounded
    * [[graft.expr.TopKByScore]] aggregation — k values per partition
    * over the wire, merged associatively; the sketch column is 512 bytes
    * regardless of cohort size. The exact columns (one equi-join) are
    * the audit the sketch replaces at 100 TB.
    */
  private val kmvSketchQ: Q = (s, dir) => {
    import graft.expr.TopKByScore
    val k = 64
    def hashFrac(c: Column): Column =
      (conv(substring(md5(concat_ws(":", lit("u"), c)), 1, 8), 16, 10)
        .cast("long") + 1L).cast("double") / lit(4294967296.0)
    val topk = udaf(new TopKByScore(k))
    def sketch(t: String, f: String, cnt: String): DataFrame =
      Tables.events(s, dir).filter(col("event_type") === t)
        .select(col("user_id")).distinct()
        .select(hashFrac(col("user_id")).as("h"))
        .agg(topk(-col("h"), lit(0L), lit(0L), lit(0L), lit(0L), lit(0.0))
          .as("tk"), count(lit(1)).as(cnt))
        .select(expr("transform(tk, e -> -e.score)").as(f), col(cnt))
    val ua = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val ub = Tables.events(s, dir).filter(col("event_type") === "click")
      .select(col("user_id")).distinct()
    val xi = ua.join(ub, "user_id")
      .agg(count(lit(1)).as("exact_inter"))
    sketch("purchase", "f_a", "cnt_a")
      .crossJoin(sketch("click", "f_b", "cnt_b")) // 1-row sketch frames
      .crossJoin(xi)
      .withColumn("u", expr("array_sort(array_distinct(concat(f_a, f_b)))"))
      .withColumn("m", size(col("u")).cast("long"))
      .withColumn("theta_u",
        when(col("m") < k, lit(1.0)).otherwise(element_at(col("u"), k)))
      .withColumn("c_inter",
        size(expr("filter(array_intersect(f_a, f_b), x -> x < theta_u)"))
          .cast("long"))
      .select(
        round(when(col("cnt_a") < k, col("cnt_a").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("f_a"), k)), 4)
          .as("est_a"),
        round(when(col("cnt_b") < k, col("cnt_b").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("f_b"), k)), 4)
          .as("est_b"),
        round(when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("theta_u")), 4)
          .as("est_union"),
        round(col("c_inter").cast("double") / col("theta_u"), 4)
          .as("est_inter"),
        col("cnt_a").as("exact_a"), col("cnt_b").as("exact_b"),
        (col("cnt_a") + col("cnt_b") - col("exact_inter")).as("exact_union"),
        col("exact_inter"))
  }
  private val kmvSketchSql =
    """WITH a AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |b AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |ah AS (
      |  SELECT (('0x' || substring(md5('u:' || CAST(user_id AS VARCHAR)),
      |    1, 8))::BIGINT + 1) / 4294967296.0 AS h FROM a),
      |bh AS (
      |  SELECT (('0x' || substring(md5('u:' || CAST(user_id AS VARCHAR)),
      |    1, 8))::BIGINT + 1) / 4294967296.0 AS h FROM b),
      |sa AS (SELECT (list(h ORDER BY h))[1:64] AS fa,
      |              CAST(count(*) AS BIGINT) AS cnt_a FROM ah),
      |sb AS (SELECT (list(h ORDER BY h))[1:64] AS fb,
      |              CAST(count(*) AS BIGINT) AS cnt_b FROM bh),
      |xi AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
      |       FROM a JOIN b USING (user_id)),
      |m AS (
      |  SELECT fa, fb, cnt_a, cnt_b, exact_inter,
      |         list_sort(list_distinct(list_concat(fa, fb))) AS uu
      |  FROM sa, sb, xi),
      |calc AS (
      |  SELECT *,
      |    CASE WHEN len(uu) < 64 THEN 1.0 ELSE uu[64] END AS theta_u,
      |    len(list_filter(list_intersect(fa, fb),
      |      x -> x < (CASE WHEN len(uu) < 64 THEN 1.0 ELSE uu[64] END)))
      |      AS c_inter
      |  FROM m)
      |SELECT
      |  round(CASE WHEN cnt_a < 64 THEN CAST(cnt_a AS DOUBLE)
      |             ELSE 63.0 / fa[64] END, 4) AS est_a,
      |  round(CASE WHEN cnt_b < 64 THEN CAST(cnt_b AS DOUBLE)
      |             ELSE 63.0 / fb[64] END, 4) AS est_b,
      |  round(CASE WHEN len(uu) < 64 THEN CAST(len(uu) AS DOUBLE)
      |             ELSE 63.0 / uu[64] END, 4) AS est_union,
      |  round(c_inter / theta_u, 4) AS est_inter,
      |  cnt_a AS exact_a, cnt_b AS exact_b,
      |  CAST(cnt_a + cnt_b - exact_inter AS BIGINT) AS exact_union,
      |  exact_inter
      |FROM calc""".stripMargin

  // ---------------------------------------------------- zone-map audit
  /** Zone-map (file min/max) pruning audit: bin `lineitem` into 64
    * equal-row "files" under two layouts — insertion order (orderkey)
    * vs sorted by the predicate column (shipdate) — record per-file
    * min/max shipdate, and count the files and rows a one-month
    * predicate would skip. The decision artifact a 100 TB table owner
    * reads before paying for a sort/Z-order rewrite: rows_scanned is
    * the actual I/O each layout leaves. Binning is
    * [[Tiling.ntileDistributed]] (exact ntile semantics, no
    * SinglePartition window — plan-locked); everything after is two
    * map-side-combinable aggregations.
    */
  private val zoneAuditQ: Q = (s, dir) => {
    val lo = lit("1998-06-01").cast("timestamp")
    val hi = lit("1998-07-01").cast("timestamp")
    def audit(layout: String, rangeCol: Column,
              orderCols: Seq[Column]): DataFrame = {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      val skipped = col("mx") < lo || col("mn") > hi
      Tiling.ntileDistributed(li, 64, rangeCol, orderCols, "bin")
        .groupBy(col("bin"))
        .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"),
          count(lit(1)).as("rows_in"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(skipped, 1L).otherwise(0L)).as("files_skipped"),
          sum(when(skipped, 0L).otherwise(col("rows_in"))).as("rows_scanned"))
        .select(lit(layout).as("layout"), col("n_files").cast("long"),
          col("files_skipped"), col("rows_scanned"))
    }
    audit("insertion_order", col("l_orderkey"),
      Seq(col("l_orderkey"), col("l_linenumber")))
      // l_shipdate ships as TIMESTAMP_NTZ, which has no direct double
      // cast — hop through TIMESTAMP (wall-clock exact under the UTC
      // session timezone); ordering stays monotone with the raw column
      .unionByName(audit("shipdate_sorted",
        col("l_shipdate").cast("timestamp").cast("double"),
        Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))
      .orderBy(col("layout"))
  }
  private val zoneAuditSql = {
    def audit(layout: String, order: String): String =
      s"""SELECT '$layout' AS layout,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(CASE WHEN mx < TIMESTAMP '1998-06-01 00:00:00'
         |                  OR mn > TIMESTAMP '1998-07-01 00:00:00'
         |                THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
         |  CAST(sum(CASE WHEN mx < TIMESTAMP '1998-06-01 00:00:00'
         |                  OR mn > TIMESTAMP '1998-07-01 00:00:00'
         |                THEN 0 ELSE rows_in END) AS BIGINT) AS rows_scanned
         |FROM (
         |  SELECT bin, min(l_shipdate) AS mn, max(l_shipdate) AS mx,
         |         count(*) AS rows_in
         |  FROM (SELECT l_shipdate,
         |          ntile(64) OVER (ORDER BY $order) AS bin FROM lineitem)
         |  GROUP BY bin)""".stripMargin
    s"""${audit("insertion_order", "l_orderkey, l_linenumber")}
       |UNION ALL
       |${audit("shipdate_sorted", "l_shipdate, l_orderkey, l_linenumber")}
       |ORDER BY layout""".stripMargin
  }

  // ------------------------------------------------------------ registry

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_skyline", skylineQ, Some(skylineSql)),
    ("q_bfs_hops", bfsHopsQ, Some(bfsHopsSql)),
    ("q_ngram_novelty", ngramNoveltyQ, Some(ngramNoveltySql)),
    ("q_kmv_sketch", kmvSketchQ, Some(kmvSketchSql)),
    ("q_zone_audit", zoneAuditQ, Some(zoneAuditSql)))

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  val oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
