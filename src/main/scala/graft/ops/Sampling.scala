package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / density probes (SURVEY §2.4 — D3, D4).
  */
object Sampling {

  /** D3: top-k densest rows (fewest nulls) — derived column + orderBy+limit
    * → Spark plans TakeOrderedAndProject (per-partition heap, no total
    * sort). Tie-break columns keep the result deterministic.
    * (`utils/extract_most_populated_rows.py:4-5`)
    */
  def topKDense(df: DataFrame, k: Int, tieBreakers: Seq[Column]): DataFrame =
    df.withColumn("null_count", PivotAgg.nullCount(df))
      .orderBy(col("null_count").asc +: tieBreakers: _*)
      .limit(k)

  /** D4: exact-N seeded random sample
    * (`utils/extract_small_sample_of_data.py:7`). Engine-deterministic
    * (Spark rand(seed)), NOT pandas-RNG compatible (SURVEY §7.4).
    *
    * Scale path: rand is computed map-side; TakeOrderedAndProject keeps
    * only N rows per partition before the single-reduce merge — no full
    * shuffle of the data. For N large enough to hurt the driver, switch
    * to fraction-oversample + repartition.
    */
  def exactSample(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Exact-N HASH-deterministic sample: order by md5 of the key columns —
    * pseudo-random but engine-independent (any engine with md5 draws the
    * SAME sample, unlike seeded RNG sampling). Same TakeOrdered scale
    * shape as [[exactSample]]; the key columns double as tie-breakers so
    * the cut is total-ordered.
    */
  def hashSample(df: DataFrame, n: Int, keyCols: Seq[Column]): DataFrame =
    df.withColumn("h", md5(concat_ws("|", keyCols: _*)))
      .orderBy(col("h") +: keyCols: _*)
      .limit(n)
}
