package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
