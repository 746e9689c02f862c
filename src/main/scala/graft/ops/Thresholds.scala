package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5: schema-driven plausibility-cap cleanup (SURVEY §2.5;
  * `usda_branded_food_data_pipeline.py:14-23,116-124`).
  *
  * For each dynamic (nutrient) column: parse the unit out of the column
  * name (`"NAME (UNIT)"`), look up a cap by full column name first, else
  * by unit; values above the cap become null; everything is rounded to 2.
  * Unknown units pass through un-capped but still rounded.
  *
  * Emitted as ONE `select` — a single codegen'd projection regardless of
  * how many hundreds of nutrient columns exist (Catalyst folds the
  * literal caps; codegen fallback handles pathological widths).
  */
object Thresholds {

  /** The reference's caps, per 100 g (`:14-23`) — mirrored key-for-key:
    * the energy caps apply only to the exact columns `ENERGY (KCAL)` /
    * `ENERGY (KJ)` (full-name lookup), while G/MG/UG cap any column with
    * that parsed unit (unit-level fallback), exactly as the reference's
    * dict lookup order does.
    */
  val defaultCaps: Map[String, Double] = Map(
    "ENERGY (KCAL)" -> 900.0,
    "ENERGY (KJ)" -> 3766.0,
    "VITAMIN A, IU (IU)" -> 333333.0,
    "VITAMIN D (D2 + D3), INTERNATIONAL UNITS (IU)" -> 4000000.0,
    "VITAMIN E (LABEL ENTRY PRIMARILY) (IU)" -> 1493.0,
    "G" -> 100.0,
    "MG" -> 100000.0,
    "UG" -> 100000000.0)

  /** Unit parsed from a `"NAME (UNIT)"` column label — reference's
    * `column.split('(')[-1].replace(')','').strip()` (`:119`).
    */
  def unitOf(columnName: String): String = {
    val i = columnName.lastIndexOf('(')
    if (i < 0) columnName.trim
    else columnName.substring(i + 1).replace(")", "").trim
  }

  def apply(df: DataFrame, fixedCols: Seq[String],
            caps: Map[String, Double] = defaultCaps, scale: Int = 2): DataFrame = {
    val dynamic = df.columns.diff(fixedCols)
    val out = df.columns.map { c =>
      if (fixedCols.contains(c)) col(c)
      else caps.get(c).orElse(caps.get(unitOf(c))) match {
        case Some(cap) =>
          round(when(col(c) <= lit(cap), col(c)), scale).as(c)
        case None => round(col(c), scale).as(c)
      }
    }
    require(dynamic.nonEmpty || fixedCols.nonEmpty, "empty schema")
    df.select(out.toIndexedSeq: _*)
  }
}
