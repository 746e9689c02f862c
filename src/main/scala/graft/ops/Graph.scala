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
}
