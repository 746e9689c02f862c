package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact deduplication operators.
  *
  * Latest-record-per-key mirrors the reference's sort+drop_duplicates idiom
  * (`usda_branded_food_data_pipeline.py:68-69`: sort by (gtin_upc asc,
  * fdc_id desc), keep first per gtin_upc == keep max fdc_id per key).
  *
  * Scale notes: both forms are a single hash shuffle on the key columns.
  * `latestPerKey` uses a window `row_number`; at 100 TB prefer the
  * `max_by`-aggregate form (`latestPerKeyAgg`) when only a bounded set of
  * payload columns is needed — it map-side combines, the window form does
  * a full sort within partitions.
  */
object Dedup {

  /** Keep the single row per key that maximizes `orderCol` (deterministic,
    * unlike `dropDuplicates`). Ties broken by the tieBreaker columns.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
                   tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreakers: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregate form: keeps (key, max-by payload) with map-side combine —
    * a hash aggregate instead of the window form's shuffle+sort, so it's
    * the preferred shape at scale. `orderCols` is the lexicographic
    * keep-rule (struct comparison), same as the window form's ORDER BY.
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String],
                      orderCols: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(orderCols: _*)).as("__row"))
      .select(col("__row.*"))
  }

  /** Exact duplicate removal over a chosen column set (hash-groupBy). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Connected components over an undirected pair list (near-dup
    * candidate pairs → dedup clusters): iterative min-label propagation
    * to a fixpoint. Each node ends labeled with the smallest id in its
    * component — the canonical "cluster representative" for near-dup
    * collapse.
    *
    * Scale shape: every iteration is one keyed join + one min-aggregate
    * (two shuffles), converging in O(component diameter) rounds — near-dup
    * clusters are tiny (pairs chained through a few shared neighbors), so
    * 2-4 rounds in practice. Each round's result is `localCheckpoint`ed:
    * iterative DataFrames MUST cut lineage per round or the logical plan
    * doubles every iteration (plan-string rendering alone goes
    * exponential). On a real cluster prefer `checkpoint` to a reliable
    * store (survives executor loss); for adversarial diameters swap in
    * the large-star/small-star variant (same per-round shape, O(log n)
    * rounds).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    // labels only ever decrease, so Σ labels strictly decreases until the
    // fixpoint — an O(1)-output scalar agg per round instead of a
    // join-based diff (decimal sum: exact at any id magnitude/parallelism)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast(DecimalType(38, 0)))).head()
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // push each node's label to its neighbors, keep the min seen
      val prop = labels.join(edges, col("id") === col("a"))
        .select(col("b").as("id"), col("cluster"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint()
      val s = labelSum(prop)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = prop
      iter += 1
    }
    labels
  }
}
