package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 2D Pareto frontier (skyline) — the "best tradeoff" query
  * (Börzsönyi/Kossmann/Stocker, ICDE 2001 — public literature): keep
  * every point no other point dominates, where p dominates q iff
  * p.x ≥ q.x ∧ p.y ≥ q.y with at least one strict. Data curation uses
  * it to find the quality/length (or quality/cost) frontier of a corpus
  * without committing to a scalarized score.
  */
object Skyline {

  /** Max-max skyline of a DISTINCT (x, y) point set (callers pre-aggregate
    * duplicates; extra columns ride through). Both columns must be
    * non-null; y must fit a long.
    *
    * Shape — the 100 TB design is "sort-free sweep": the textbook
    * algorithm sorts globally by (x desc, y desc) and keeps rows whose y
    * beats the running max, a SinglePartition window. Here x is
    * range-bucketed off one 1-row min/max collect (the same metadata
    * collect [[Tiling.withGlobalRank]] makes), the running max becomes a
    * window PARTITIONED BY bucket, and cross-bucket dominance folds into
    * a ≤`buckets`-row carry-in map (suffix max of per-bucket y maxima)
    * joined as a literal. Bucket ranges are disjoint and ordered, so a
    * higher-bucket point has strictly larger x and dominates iff its
    * y ≥ ours — exactly what the carry encodes; within a bucket the
    * (x desc, y desc) running max covers both the strict-x and the
    * equal-x/strict-y dominance cases. One exchange (the bucket window),
    * no global sort, no cartesian.
    */
  def skyline2D(points: DataFrame, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"skyline2D: buckets must be >= 1, got $buckets")
    val xd = col(xCol).cast("double")
    val Array(stats) = points
      .agg(min(xd).as("mn"), max(xd).as("mx"), count(lit(1)).as("n"))
      .collect()
    if (stats.getLong(2) == 0L) return points
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val bucket: Column =
      if (mn == mx) lit(1L)
      else least(width_bucket(xd, lit(mn), lit(mx), lit(buckets)),
        lit(buckets.toLong))
    val wb = points.withColumn("__graft_sb", bucket)
    // per-bucket y maxima (≤ buckets rows — metadata-scale collect) →
    // carry(b) = max y over buckets strictly above b (suffix max)
    val bmax = wb.groupBy(col("__graft_sb"))
      .agg(max(col(yCol).cast("long")).as("my"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val carries = Seq.newBuilder[(Long, Long)]
    var run = Long.MinValue
    for ((b, my) <- bmax) {
      carries += b -> run
      run = math.max(run, my)
    }
    val carryMap = map(carries.result()
      .flatMap { case (b, c) => Seq(lit(b), lit(c)) }: _*)
    val w = Window.partitionBy(col("__graft_sb"))
      .orderBy(col(xCol).desc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    wb.withColumn("__graft_rm", max(col(yCol).cast("long")).over(w))
      .filter(col(yCol).cast("long") >
        greatest(coalesce(col("__graft_rm"), lit(Long.MinValue)),
          coalesce(element_at(carryMap, col("__graft_sb")),
            lit(Long.MinValue))))
      .drop("__graft_sb", "__graft_rm")
  }
}
