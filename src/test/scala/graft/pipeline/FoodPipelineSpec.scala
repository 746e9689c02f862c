package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden pipeline test over the USDA-shaped micro-fixtures
  * (src/test/resources/usda/, FIXTURES.md §A) — replaces the reference's
  * eyeballed notebook check with hand-computed expectations.
  */
class FoodPipelineSpec extends SparkSpec {

  private lazy val out = {
    val dir = getClass.getResource("/usda").getPath
    FoodPipeline.run(spark, dir).cache()
  }

  test("output schema: 5 fixed cols + alphabetically sorted nutrient labels") {
    assert(out.columns.toSeq == Seq(
      "FOOD_RECORD_ID", "FOOD_ID", "FOOD_NAME", "FOOD_SERVING_SIZE",
      "FOOD_INGREDIENTS", "ENERGY (KCAL)", "PROTEIN (G)",
      "WEIRD NUTRIENT (GRM)"))
  }

  test("survivor rows: dedup winner + clean row only") {
    // 100 loses the UPC dedup to 101; 102 (junk serving → null) and 105
    // (null unit) die at the serving-size dropna; 103 (IU) at the
    // not-contains filter; 104 at the ingredients dropna; 999 at the
    // semi-join.
    assert(out.select("FOOD_RECORD_ID").collect().map(_.getString(0)).toSeq
      == Seq("101", "106"))
  }

  test("row 101: dedup kept max fdc_id, dup measurements averaged, over-cap nulled") {
    val r = out.filter(out("FOOD_RECORD_ID") === "101").head()
    assert(r == Row("101", "00011110000001", "CHOC BAR DELUXE", "30.0 G",
      "SUGAR, COCOA, SOY", null, 15.29, null))
    // 15.29 = round(avg(10.123, 20.456), 2); Energy 950 > 900 KCAL cap → null
  }

  test("row 106: unknown unit GRM un-capped but rounded; strings normalized") {
    val r = out.filter(out("FOOD_RECORD_ID") === "106").head()
    assert(r == Row("106", "00066660000006", "HONEY SPICE", "10.0 G",
      "HONEY , SPICE", 450.57, 5.5, 123456.79))
  }

  test("leading zeros preserved in FOOD_ID (string, never numeric)") {
    assert(out.select("FOOD_ID").collect().forall(_.getString(0).startsWith("000")))
  }

  test("S5 CSV sink round-trips the golden output (incl. leading zeros)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_food_csv").toString
    FoodPipeline.writeCsv(out, s"$tmp/out")
    val back = spark.read.option("header", "true").csv(s"$tmp/out")
    assert(back.count() == 2)
    assert(back.columns.toSeq == out.columns.toSeq)
    // values come back as strings but un-mangled
    assert(back.select("FOOD_ID").collect().forall(_.getString(0).startsWith("000")))
  }
}
