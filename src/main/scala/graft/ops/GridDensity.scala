package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cell-based density clustering (the GriDBSCAN decomposition of DBSCAN
  * — Ester et al., KDD 1996 lineage): density is a per-cell count,
  * clustering is connected components over 8-adjacent dense cells, so
  * the corpus is touched exactly twice (one combinable count, one
  * cell-key join) and pairwise point distances never exist. The ε-graph
  * lives on core CELLS — ≤ grid² rows no matter the corpus size — where
  * [[Dedup.connectedComponents]]' propagation converges in a round or
  * two. At 100 TB a finer grid only grows the cell table.
  */
object GridDensity {

  /** Cluster `pts` (columns `id`, `cx`, `cy`; cells in [0, grid)²)
    * with core threshold `minPts` (a 1-row frame with column `mp`,
    * typically data-derived). Returns (id, k, cluster): `k` the packed
    * cell key, `cluster` the component's minimum core-cell key, or −1
    * for points in non-core cells (noise).
    */
  def cluster(pts: DataFrame, grid: Int, minPts: DataFrame): DataFrame = {
    val counts = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("npts"))
    val core = counts.crossJoin(broadcast(minPts)) // 1-row threshold frame
      .filter(col("npts") >= col("mp"))
      .select(col("cx"), col("cy"))
    val offsets = expr(
      """array(named_struct('dx', -1L, 'dy', -1L),
        |      named_struct('dx', -1L, 'dy',  0L),
        |      named_struct('dx', -1L, 'dy',  1L),
        |      named_struct('dx',  0L, 'dy', -1L),
        |      named_struct('dx',  0L, 'dy',  1L),
        |      named_struct('dx',  1L, 'dy', -1L),
        |      named_struct('dx',  1L, 'dy',  0L),
        |      named_struct('dx',  1L, 'dy',  1L))""".stripMargin)
    val nbrs = core.withColumn("d", explode(offsets))
      .select((col("cx") * grid + col("cy")).as("a"),
        (col("cx") + col("d.dx")).as("nx"),
        (col("cy") + col("d.dy")).as("ny"))
      .filter(col("nx").between(0, grid - 1) &&
        col("ny").between(0, grid - 1))
      .join(core.select(col("cx").as("nx"), col("cy").as("ny"),
        (col("cx") * grid + col("cy")).as("b")), Seq("nx", "ny"))
      .select(col("a"), col("b"))
    val selfs = core.select((col("cx") * grid + col("cy")).as("a"))
      .select(col("a"), col("a").as("b")) // singleton core cells cluster too
    val cc = Dedup.connectedComponents(nbrs.union(selfs), "a", "b")
      .select(col("id").as("k"), col("cluster"))
    pts.select(col("id"), (col("cx") * grid + col("cy")).as("k"))
      .join(cc, Seq("k"), "left")
      .select(col("id"), col("k"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
