package graft.schema

import org.apache.spark.sql.types._

/** Explicit input schemas (SURVEY §1.3): CSV inference is slow and
  * nondeterministic at scale — the reference's `low_memory=False` pandas
  * inference (`usda_branded_food_data_pipeline.py:141-144`) becomes
  * explicit StructTypes. Only the consumed columns are declared; extra
  * CSV columns are dropped by Spark's column pruning on the scan.
  */
object Schemas {

  /** branded_food.csv — `usda_branded_food_data_pipeline.py:68-80`. */
  val brandedFood: StructType = StructType(Seq(
    StructField("fdc_id", LongType),
    StructField("gtin_upc", StringType),       // leading zeros significant
    StructField("ingredients", StringType),
    StructField("serving_size", StringType),   // junk coerced to null (E2)
    StructField("serving_size_unit", StringType)))

  /** food.csv — `:82-85`. */
  val food: StructType = StructType(Seq(
    StructField("fdc_id", LongType),
    StructField("description", StringType)))

  /** nutrient.csv — `:87-92`. */
  val nutrient: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("unit_name", StringType)))

  /** food_nutrient.csv — `:94-102`. */
  val foodNutrient: StructType = StructType(Seq(
    StructField("fdc_id", LongType),
    StructField("nutrient_id", LongType),
    StructField("amount", DoubleType)))
}
