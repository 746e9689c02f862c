package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation / reshape operators (SURVEY §2.5 — A1/A2/A3 of
  * `usda_branded_food_data_pipeline.py:101-114`).
  */
object PivotAgg {

  /** A1: collapse duplicate measurements to the mean per key pair
    * (`:101`). Plans partial+final HashAggregate (map-side combine).
    */
  def groupAvg(df: DataFrame, keys: Seq[String], valueCol: String,
               out: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(avg(col(valueCol)).as(out))

  /** A1+A2 fused: long → wide pivot with the mean as cell value (`:102`).
    *
    * `values` MUST be passed explicitly (collected+sorted from the dim
    * table): skips Spark's extra distinct job AND makes the output schema
    * deterministic for the oracle compare (SURVEY §4.3). Cardinality must
    * stay well under spark.sql.pivotMaxValues — enforced by the caller
    * knowing its dim table.
    */
  def pivotAvg(df: DataFrame, rowKey: String, pivotKey: String,
               valueCol: String, values: Seq[String]): DataFrame =
    df.groupBy(col(rowKey))
      .pivot(pivotKey, values)
      .agg(avg(col(valueCol)))

  /** A3: stable column order — fixed prefix, then the dynamic tail sorted
    * alphabetically (`:111-114`). Driver-side schema operation only.
    */
  def reorderColumns(df: DataFrame, fixed: Seq[String]): DataFrame = {
    val tail = df.columns.diff(fixed).sorted
    df.select((fixed ++ tail).map(col): _*)
  }

  /** A4/D3 helper: horizontal null count — a fold over the schema, no
    * shuffle (`utils/extract_most_populated_rows.py:4`).
    */
  def nullCount(df: DataFrame): Column =
    df.columns.map(c => when(col(c).isNull, 1).otherwise(0))
      .reduce(_ + _).as("null_count")
}
