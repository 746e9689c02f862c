package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Tiling.ntileDistributed]] must be bit-identical to Spark's own
  * `ntile(t) OVER (ORDER BY ...)` — the global window is the semantics
  * spec; the distributed form is the scale implementation.
  */
class TilingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def parity(tiles: Int, buckets: Int): Unit = {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val expected = orders
      .withColumn("t", ntile(tiles).over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    val got = Tiling.ntileDistributed(
      orders, tiles, col("o_totalprice"),
      Seq(col("o_totalprice"), col("o_orderkey")), "t", buckets)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"ntileDistributed($tiles, buckets=$buckets) != ntile window")
  }

  test("parity with ntile window: quartiles") { parity(4, 64) }

  test("withGlobalRank parity with row_number window") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val expected = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
        .cast("long") - 1)
    val (got, total) = Tiling.withGlobalRank(orders, col("o_totalprice"),
      Seq(col("o_totalprice"), col("o_orderkey")), "rn", buckets = 16)
    assert(total == orders.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
  test("parity with ntile window: 7 tiles, few buckets (uneven split)") {
    parity(7, 3)
  }
  test("parity with ntile window: more tiles than fits evenly") {
    parity(13, 16)
  }

  test("exactPercentiles matches Spark's percentile aggregate (interpolated)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val got = Tiling.exactPercentiles(li, col("l_quantity"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9), buckets = 16)
      .head()
    val exp = li.agg(
      expr("percentile(l_quantity, 0.25)"),
      expr("percentile(l_quantity, 0.5)"),
      expr("percentile(l_quantity, 0.9)")).head()
    for (i <- 0 until 3)
      assert(math.abs(got.getDouble(i) - exp.getDouble(i)) < 1e-9,
        s"p[$i]: ${got.getDouble(i)} != ${exp.getDouble(i)}")
    // fractional interpolation on a tiny known set: p50 of [1,2,10,20] = 6
    val small = Seq(1.0, 2.0, 10.0, 20.0).toDF("v")
    val g2 = Tiling.exactPercentiles(small, col("v"), Seq("p50" -> 0.5)).head()
    assert(g2.getDouble(0) == 6.0)
  }

  test("ties on the range column never split across tiles incorrectly") {
    import spark.implicits._
    // heavy ties: 100 rows, only 5 distinct values
    val df = (1 to 100).map(i => (i.toLong, (i % 5).toDouble)).toDF("k", "v")
    val expected = df.withColumn("t",
      ntile(4).over(Window.orderBy(col("v"), col("k"))))
    val got = Tiling.ntileDistributed(
      df, 4, col("v"), Seq(col("v"), col("k")), "t", buckets = 8)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("null range values rank first, matching the window's asc_nulls_first") {
    import spark.implicits._
    val df = (1 to 60).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some(i.toDouble % 11)))
      .toDF("k", "v")
    val expected = df.withColumn("t",
      ntile(4).over(Window.orderBy(col("v"), col("k"))))
    val got = Tiling.ntileDistributed(
      df, 4, col("v"), Seq(col("v"), col("k")), "t", buckets = 8)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("NaN range values rank last (window NaN order), no stats poisoning") {
    import spark.implicits._
    val df = (1 to 40).map(i =>
      (i.toLong, if (i % 9 == 0) Double.NaN else i.toDouble % 7))
      .toDF("k", "v")
    val expected = df.withColumn("t",
      ntile(3).over(Window.orderBy(col("v"), col("k"))))
    val got = Tiling.ntileDistributed(
      df, 3, col("v"), Seq(col("v"), col("k")), "t", buckets = 4)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // exactPercentiles drops NaN: median of 1..9 with NaNs mixed in
    val vs = ((1 to 9).map(_.toDouble) ++ Seq(Double.NaN, Double.NaN)).toDF("v")
    assert(Tiling.exactPercentiles(vs, col("v"), Seq("p50" -> 0.5))
      .head().getDouble(0) == 5.0)
  }

  test("±Infinity neither collapses buckets nor NaNs a boundary percentile") {
    import spark.implicits._
    val df = ((1 to 30).map(i => (i.toLong, i.toDouble % 5)) ++
      Seq((97L, Double.PositiveInfinity), (98L, Double.NegativeInfinity)))
      .toDF("k", "v")
    val expected = df.withColumn("t",
      ntile(4).over(Window.orderBy(col("v"), col("k"))))
    val got = Tiling.ntileDistributed(
      df, 4, col("v"), Seq(col("v"), col("k")), "t", buckets = 8)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // bucketing must stay spread — Inf previously nulled width_bucket for
    // every row, silently re-creating the single-partition sort
    val (ranked, _) = Tiling.withGlobalRank(df, col("v"),
      Seq(col("v"), col("k")), "rn", buckets = 8)
    assert(ranked.count() == 32)
    // percentile landing exactly on the Inf value: Inf, not NaN
    val pv = Tiling.exactPercentiles(
      Seq(1.0, Double.PositiveInfinity).toDF("v"), col("v"),
      Seq("p100" -> 1.0)).head().getDouble(0)
    assert(pv.isPosInfinity)
  }

  test("exactPercentiles ignores nulls like the percentile aggregate") {
    import spark.implicits._
    val df = (Seq.fill(5)(None) ++ (1 to 99).map(i => Some(i.toDouble)))
      .toDF("v")
    val got = Tiling.exactPercentiles(df, col("v"), Seq("p50" -> 0.5)).head()
    assert(got.getDouble(0) == 50.0) // median of 1..99, nulls excluded
  }

  test("degenerate range (all values equal) still matches") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, 3.0)).toDF("k", "v")
    val expected = df.withColumn("t",
      ntile(4).over(Window.orderBy(col("v"), col("k"))))
    val got = Tiling.ntileDistributed(
      df, 4, col("v"), Seq(col("v"), col("k")), "t", buckets = 8)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("fewer rows than tiles: each row its own tile") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val got = Tiling.ntileDistributed(
      df, 8, col("v"), Seq(col("v"), col("k")), "t", buckets = 4)
      .orderBy("v").select("t").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("empty input yields empty output with the tile column") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    val got = Tiling.ntileDistributed(
      df, 4, col("v"), Seq(col("v"), col("k")), "t")
    assert(got.columns.contains("t") && got.count() == 0)
  }
}
