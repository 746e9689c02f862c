package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField}

/** Projection / rename / string-cleaning / filter operators (SURVEY §2.2,
  * §2.6 — P1-P9, E1-E7 of the reference pipeline,
  * `usda_branded_food_data_pipeline.py:67-129`).
  *
  * All pure `DataFrame => DataFrame`, all single-projection (no shuffle) —
  * Catalyst collapses chains of these into one whole-stage-codegen'd
  * projection, and filters push to the scan.
  */
object Cleaning {

  /** E1: trim+uppercase every StringType column (reference loops over
    * `select_dtypes(include='object')` — `:73-74`). One projection.
    */
  def normalizeStrings(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map {
      case StructField(n, StringType, _, _) => upper(trim(col(n))).as(n)
      case StructField(n, _, _, _)          => col(n)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** E2: `pd.to_numeric(errors='coerce')` + round — try_cast yields null
    * on junk (plain cast throws under ANSI mode), same semantics (`:76`).
    */
  def castCoerceDouble(df: DataFrame, c: String, scale: Int = 2): DataFrame =
    df.withColumn(c, round(col(c).try_cast(DoubleType), scale))

  /** E3: `"N.NN UNIT"` concat (`:77-79`). Spark concat null-propagates —
    * deliberate divergence from pandas' `"nan G"` artifact (SURVEY §7.4).
    */
  def concatWithSep(df: DataFrame, out: String, left: String, right: String,
                    sep: String = " "): DataFrame =
    df.withColumn(out, concat(col(left).cast(StringType), lit(sep), col(right)))

  /** P6 + E4: drop rows where `c` contains `needle`, with pandas
    * `na=False` semantics — null values PASS this filter (`:127`).
    */
  def filterNotContains(df: DataFrame, c: String, needle: String): DataFrame =
    df.filter(!coalesce(col(c).contains(needle), lit(false)))

  /** P7: `dropna(subset=...)` (`:128,:154`). */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** P1-P4: project + bulk rename. */
  def projectRename(df: DataFrame, keepRename: Seq[(String, String)]): DataFrame =
    df.select(keepRename.map { case (from, to) => col(from).as(to) }: _*)

  /** Name-display concat used for nutrient labels: `name + " (" + unit + ")"`
    * (`:89-91`).
    */
  def parenLabel(name: Column, unit: Column): Column =
    concat(name, lit(" ("), unit, lit(")"))
}
