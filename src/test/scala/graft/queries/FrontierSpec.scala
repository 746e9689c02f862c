package graft.queries

import graft.SparkSpec
import graft.Tables
import graft.ops.{Graph, Skyline}
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("skyline matches the brute-force dominance sweep") {
    val pts = Tables.part(spark, sf)
      .select(floor(col("p_retailprice") * 100 + 0.5).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .distinct()
    val all = pts.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = all.filter { case (x, y) =>
      !all.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
    val got = Skyline.skyline2D(pts, "pc", "sz")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"got $got want $brute")
  }

  test("skyline degenerate range (all x equal) keeps only the max-y point") {
    import spark.implicits._
    val pts = Seq((5L, 1L), (5L, 3L), (5L, 2L)).toDF("x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 3L)))
  }

  test("multi-source BFS assigns min-hop distances on a path fixture") {
    import spark.implicits._
    // path 0-1-2-3-4-5, separate component {6,7}; source {0}, budget 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L)).toDF("s", "d")
    val sources = Seq(0L).toDF("node")
    val got = Graph.multiSourceBfs(edges, "s", "d", sources, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3), s"got $got")
  }

  test("ngram novelty: every distinct gram is novel in exactly one doc") {
    val out = Frontier.queries("q_ngram_novelty")(spark, sf)
    val sumNovel = out.agg(sum(col("n_novel"))).head().getLong(0)
    val distinctGrams = Registry.spread(Tables.documents(spark, sf))
      .select(explode(array_distinct(
        graft.ops.TextOps.shingles(col("text"), 3))).as("g"))
      .select(countDistinct(col("g"))).head().getLong(0)
    assert(sumNovel == distinctGrams, s"$sumNovel != $distinctGrams")
  }

  test("kmv sketch is exact while the sets fit inside k") {
    // sf0.001 has ~15 users — far below k=64, so every estimate must
    // equal its exact column (the sketch IS the set)
    val r = Frontier.queries("q_kmv_sketch")(spark, sf).head()
    assert(r.getDouble(0) == r.getLong(4).toDouble, s"est_a $r")
    assert(r.getDouble(1) == r.getLong(5).toDouble, s"est_b $r")
    assert(r.getDouble(2) == r.getLong(6).toDouble, s"est_union $r")
    assert(r.getDouble(3) == r.getLong(7).toDouble, s"est_inter $r")
  }

  test("zone audit: sorting by the predicate column never skips less") {
    val rows = Frontier.queries("q_zone_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (filesI, skipI, scanI) = rows("insertion_order")
    val (filesS, skipS, scanS) = rows("shipdate_sorted")
    assert(filesI == 64 && filesS == 64)
    assert(skipS >= skipI, s"sorted skipped $skipS < insertion $skipI")
    assert(scanS <= scanI, s"sorted scanned $scanS > insertion $scanI")
    // the sorted layout must actually prune: a one-month predicate over
    // ~4 years of data should skip the vast majority of 64 tight files
    assert(skipS >= 48, s"sorted layout only skipped $skipS/64")
  }
}
