package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Engine-local invariants for the round-2 extended registry (the oracle
  * gate covers the value-level contract; these cover the properties the
  * oracle can't see — stream/batch equivalence, sampling behavior,
  * reshape inverses).
  */
class ExtendedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("stream-stream interval join equals the batch self-join rollup") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj_spec")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      tmp.resolve("events.parquet"))
    val streamed = graft.streaming.EventStream
      .runStreamJoin(spark, tmp.toString, queryName = "ssj_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val e = Tables.events(spark, sf)
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = c.join(p,
        col("p_user") === col("c_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("interval 30 minutes"))
      .groupBy(col("c_user")).agg(count(lit(1)).as("pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("unpivot is the inverse of pivot: long form re-pivots to the wide row") {
    import spark.implicits._
    val wide = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "a", "b")
    val long = wide.unpivot(Array(col("id")), Array(col("a"), col("b")),
      "measure", "val")
    assert(long.count() == 4)
    val roundTrip = long.groupBy("id").pivot("measure", Seq("a", "b"))
      .agg(first(col("val")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(roundTrip.toSeq == Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)))
  }

  test("stratified sample: deterministic under a fixed seed, ~fractions, subset rows") {
    val li = Tables.lineitem(spark, sf)
    val fractions = Map("A" -> 0.10, "N" -> 0.05, "R" -> 0.20)
    def sampled = li.stat.sampleBy("l_returnflag", fractions, 42L)
    val c1 = sampled.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c2 = sampled.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == c2) // same seed + same partitioning → identical sample
    val totals = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val got = c1.getOrElse(k, 0L).toDouble / totals(k)
      assert(math.abs(got - f) < 0.05, s"flag $k: sampled ratio $got vs $f")
    }
  }

  test("grouping sets: per-set rows reconcile with independent aggregations") {
    val gs = Extended.queries("q_grouping_sets")(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    // the () set is the single (ALL, ALL) row and equals the full count
    val allRow = gs.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(allRow.length == 1 && allRow.head.getLong(2) == total)
    // per-flag set sums to the total too
    val flagRows = gs.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(flagRows.map(_.getLong(2)).sum == total)
  }

  test("edit-distance pairs are symmetric-free and within the bound") {
    val pairs = Extended.queries("q_edit_distance")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    val asSet = pairs.toSet
    assert(pairs.forall { case (a, b) => !asSet.contains((b, a)) })
  }

  test("HLL union estimate lands within 5% of the exact distinct count") {
    val row = Extended.queries("q_hll_union")(spark, sf).head()
    val exact = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(row.getLong(0) == exact) // emitted exact side really is exact
    assert(row.getBoolean(2), s"union estimate drifted past 5% of $exact")
    // the one-shot sketch lands in the same bound (union ≈ one-shot; not
    // bit-equal — DataSketches HLL transitions sparse→dense differently
    // when unioning than when streaming)
    val direct = Tables.lineitem(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).cast("long"))
      .head().getLong(0)
    assert(math.abs(direct - exact).toDouble / exact < 0.05)
  }

  test("sql-text query: the same SQL string runs on spark.sql (dialect-shared subset)") {
    val out = Extended.queries("q_sql_text")(spark, sf).collect()
    assert(out.length == 10)
    // revenue strictly non-increasing
    val revs = out.map(_.getDouble(2))
    assert(revs.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("JSON source captures malformed lines in _corrupt_record (PERMISSIVE)") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft_badjson")
    java.nio.file.Files.write(tmp.resolve("part-0.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": 10.5}""",
        """{"id": 2 BROKEN""",
        """{"id": 3, "v": "not_a_number"}""",
        """{"id": 4, "v": 2.5}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(tmp.toString).cache()
    try {
      assert(df.count() == 4)
      // rows 2 (syntax) and 3 (type mismatch) carry the raw line
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(df.filter(col("v").isNotNull).count() == 2)
    } finally { df.unpersist(); () }
  }

  test("date series spine has no gaps and covers the full range") {
    val days = Extended.queries("q_date_series")(spark, sf)
      .select("day").collect().map(_.getDate(0).toLocalDate)
    assert(days.length == 90) // 1995-01-01..1995-03-31
    assert(days.head == java.time.LocalDate.parse("1995-01-01"))
    assert(days.last == java.time.LocalDate.parse("1995-03-31"))
    days.sliding(2).foreach { case Array(a, b) =>
      assert(a.plusDays(1) == b)
    }
  }
}
