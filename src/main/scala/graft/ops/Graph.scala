package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames (beside [[PageRank]] and
  * [[Dedup.connectedComponentsAuto]]): exact triangle counting.
  *
  * Reference scope: the reference pipeline has no graph stage; this is
  * LLM-pipeline scope (graph dedup diagnostics — triangle density
  * distinguishes genuine duplicate clusters from chains of borderline
  * pairs — and corpus link analysis beside PageRank).
  */
object Graph {

  /** Exact triangle count via degree-ordered wedge enumeration (the
    * compact-forward algorithm; Latapy, TCS 2008 — public literature).
    *
    * Shape: canonical undirected edges → per-node degrees → orient every
    * edge from its (degree, id)-smaller endpoint to the larger → self-join
    * the directed edges on the shared apex → semi-join the wedge's closing
    * pair against the undirected edge set. Each triangle is counted
    * EXACTLY once: its unique apex under the total (degree, id) order is
    * the one vertex with both triangle edges outgoing.
    *
    * At 100 TB: every join is an equi-join (apex self-join + closing-edge
    * semi-join — no cartesian anywhere, PlanSpec-locked), and the
    * orientation bounds per-apex out-degree by O(√m), so wedge fan-out is
    * O(m^1.5) worst-case instead of Σdeg² — the hub that would explode a
    * naive wedge join (a celebrity node in a follower graph) has huge
    * IN-degree but tiny out-degree, so it never fans out. Skewed apexes
    * are further split by AQE's skew-join handling on the shuffle.
    *
    * Returns one row: n_nodes (touched), n_edges (canonical), n_triangles.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull)
      .distinct()
    val deg = e.select(col("lo").as("node"))
      .union(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("lo"), col("deg").as("deg_lo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("deg_hi")), "hi")
    val loFirst = struct(col("deg_lo"), col("lo")) <
      struct(col("deg_hi"), col("hi"))
    val dir = withDeg.select(
      when(loFirst, col("lo")).otherwise(col("hi")).as("u"),
      when(loFirst, col("hi")).otherwise(col("lo")).as("v"))
    // wedges (u; b, c): two out-edges of one apex; the closing pair is
    // probed by id order against the canonical edge set, so each wedge
    // has exactly one probe form
    val wedges = dir.select(col("u"), col("v").as("b"))
      .join(dir.select(col("u"), col("v").as("c")), "u")
      .filter(col("b") < col("c"))
    val closed = wedges.join(e,
      wedges("b") === e("lo") && wedges("c") === e("hi"), "left_semi")
    val nTri = closed.agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri) // three 1-row frames
  }

  /** Synchronous label propagation (Raghavan et al., Phys. Rev. E 2007 —
    * public literature) over an undirected graph, made DETERMINISTIC so
    * the result value-oracles: every node starts labeled with its own id,
    * and each iteration every node adopts the (count desc, label asc)
    * argmax of its neighbors' labels — an exact total order, so the
    * fixed-iteration result is bit-identical at any partitioning (the
    * float-free sibling of [[PageRank.pageRank]]'s integer ranks; the
    * classic async formulation visits nodes in random order and can't be
    * oracled). Self-loops are dropped, edges deduped to canonical form,
    * then symmetrized — every node has degree ≥ 1 by construction.
    *
    * Scale shape, mirroring PageRank's: the symmetrized adjacency is
    * materialized once (`localCheckpoint`; cluster: `checkpoint`), each
    * iteration is ONE equi-join (labels — one row per node — against
    * adjacency; AQE broadcasts it while the node set fits, and the
    * pre-bucketed co-located join is the same contingency path
    * [[PageRank.pageRankBucketed]] builds) plus TWO hash aggregations
    * that combine map-side: (node, label) counts, then the per-node
    * argmax as min(struct(−cnt, label)) — a 2-long struct per node, NOT
    * a per-node sorted window. Lineage is cut every
    * `checkpointInterval` rounds. Returns (node, label).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int,
                       checkpointInterval: Int = 4): DataFrame = {
    require(iterations >= 1, "labelPropagation: iterations must be >= 1")
    require(checkpointInterval >= 1,
      "labelPropagation: checkpointInterval must be >= 1")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull)
      .distinct()
    val adj = e.select(col("lo").as("src"), col("hi").as("dst"))
      .union(e.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint() // computed once, reused every iteration
    var labels = adj.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      // ONE exchange per iteration: repartitioning the joined rows by dst
      // satisfies the clustered distribution of BOTH downstream
      // aggregations (hash(dst) ⊆ {dst, label} and ⊆ {node}), so the
      // (node, label) count and the per-node argmax plan exchange-free
      // on top of it — vs two full aggregate exchanges in the naive form
      labels = adj
        .join(labels.withColumnRenamed("node", "src"), "src")
        .repartition(col("dst"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("lb")))
          .as("m"))
        .select(col("node"), col("m.lb").as("label"))
      if (i % checkpointInterval == 0 && i < iterations)
        labels = labels.localCheckpoint()
    }
    labels
  }

  /** Fixed-round k-core peeling (Seidman, Social Networks 1983 — public
    * literature): repeatedly drop nodes of degree < k and the edges they
    * carry. A FIXED round count (not run-to-fixpoint) keeps the result
    * value-oracle-able — the oracle replays the same rounds; real corpus
    * graphs converge in few rounds because peeling cascades are shallow.
    * Returns (node, deg): the surviving nodes with their degree in the
    * surviving subgraph.
    *
    * Scale shape: per round ONE map-side-combinable degree aggregation
    * (two projections of the edge list union'd — no join) and TWO
    * left-semi joins filtering the edge list against the (smaller)
    * survivor set; every step is keyed, no window, no cartesian. Each
    * round ends in a `localCheckpoint` (cluster: `checkpoint`) so the
    * iterative plan stays O(1) deep and each round's edge set — which
    * only ever SHRINKS — is what the next round scans.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    require(rounds >= 1, "kCore: rounds must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull)
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = e.select(col("lo").as("node"))
        .union(e.select(col("hi").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      e = e.join(keep.withColumnRenamed("node", "lo"), Seq("lo"), "left_semi")
        .join(keep.withColumnRenamed("node", "hi"), Seq("hi"), "left_semi")
        .localCheckpoint()
    }
    e.select(col("lo").as("node")).union(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }

  /** Multi-source breadth-first search with a FIXED hop budget: every
    * node reachable from `sources` (a frame with one `node` column) gets
    * `dist` = min #hops (≤ `maxHops`), level-synchronously. Returns
    * (node, dist) for reached nodes only — callers derive "unreached"
    * from the node set. A fixed budget (not run-to-fixpoint) keeps the
    * result value-oracle-able, and is the production shape anyway: k-hop
    * neighborhoods (contamination blast radius around flagged documents,
    * link-graph influence radius) rather than full shortest paths.
    *
    * Scale shape: per level ONE equi-join of the frontier against the
    * (checkpointed, reused) adjacency + ONE distinct + ONE left-anti
    * join against the visited set — all keyed on node id; no window, no
    * cartesian. Each level's fresh set is localCheckpoint'ed (cluster:
    * `checkpoint`) and the visited set stays a union of those ≤
    * maxHops+1 materialized levels, so the iterative plan is O(1) deep
    * and nothing is recomputed. The frontier SHRINKS once the BFS wave
    * saturates — late rounds are near-free.
    */
  def multiSourceBfs(edges: DataFrame, srcCol: String, dstCol: String,
                     sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"multiSourceBfs: maxHops must be >= 0, got $maxHops")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull)
      .distinct()
    val adj = e.select(col("lo").as("src"), col("hi").as("dst"))
      .union(e.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint() // computed once, reused every level
    var visited = sources.select(col("node"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = visited.select(col("node"))
    for (h <- 1 to maxHops) {
      val fresh = adj
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
        .localCheckpoint()
      visited = visited.union(fresh)
      frontier = fresh.select(col("node"))
    }
    visited
  }

  /** Fixed-round HITS (Kleinberg, JACM 1999 — public literature) in EXACT
    * integer arithmetic over a DIRECTED edge list: h₀ = 1, then per round
    * a(v) = Σ_{u→v} h(u) and h(u) = Σ_{u→v} a(v), plus a final authority
    * refresh. Deliberately unnormalized: scores stay exact Longs (bounded
    * by Σdeg^(2·rounds+1) ≪ 2⁶³ for small round budgets on bounded-degree
    * graphs), so an oracle can replay the recurrence bit-exactly — the
    * usual L2 normalization only rescales the ranking. Returns
    * (node, auth, hub) for every node with an in-edge; hub is 0 for
    * nodes without out-edges.
    *
    * Scale shape: per half-round ONE equi-join of the one-row-per-node
    * score frame against the checkpointed edge list + ONE
    * map-side-combinable sum — the [[labelPropagation]]/PageRank
    * iteration shape; no window, no cartesian.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1, s"hits: rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst") && col("src").isNotNull)
      .distinct()
      .localCheckpoint() // reused by every half-round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var h = nodes.withColumn("h", lit(1L))
    for (k <- 1 to rounds) {
      val a = e.join(h.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
      h = e.join(a.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
      if (k < rounds) h = h.localCheckpoint()
    }
    val auth = e.join(h.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst").as("node")).agg(sum(col("h")).as("auth"))
    auth.join(h.withColumnRenamed("h", "hub"), Seq("node"), "left")
      .select(col("node"), col("auth"),
        coalesce(col("hub"), lit(0L)).as("hub"))
  }
}
