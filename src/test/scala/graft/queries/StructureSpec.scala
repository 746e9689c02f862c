package graft.queries

import graft.SparkSpec
import graft.Tables
import graft.ops.GridDensity
import org.apache.spark.sql.functions._

class StructureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("grid density clustering separates two blobs and flags noise") {
    import spark.implicits._
    // blob A: 5 points in cell (2,2); blob B: 5 points spanning the
    // 8-adjacent cells (10,10)/(11,11); a lone point at (5,5) is noise
    val pts = (
      (1L to 5L).map(i => (i, 2L, 2L)) ++
      (6L to 8L).map(i => (i, 10L, 10L)) ++
      (9L to 11L).map(i => (i, 11L, 11L)) ++
      Seq((12L, 5L, 5L))
    ).toDF("id", "cx", "cy")
    val minPts = pts.sparkSession.range(1).select(lit(3L).as("mp"))
    val got = GridDensity.cluster(pts, grid = 16, minPts)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val keyA = 2 * 16 + 2
    val keyB = 10 * 16 + 10 // component min of {(10,10),(11,11)}
    assert((1L to 5L).forall(got(_) == keyA), s"blob A: $got")
    assert((6L to 11L).forall(got(_) == keyB), s"blob B: $got")
    assert(got(12L) == -1L, s"noise: $got")
  }

  test("grid dbscan census conserves points; cluster ids are core cells") {
    val out = Structure.queries("q_grid_dbscan")(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == total, "points conserved")
    out.filter(_.getLong(0) >= 0).foreach { r =>
      assert(r.getLong(0) < 256 && r.getLong(1) >= 1)
    }
  }

  test("topo layering matches a driver-side Bellman replay on a fixture") {
    import spark.implicits._
    // chain 1→2→3→4 plus shortcut 1→4 and isolated edge 10→11:
    // layers: 1:0, 2:1, 3:2, 4:3 (longest path wins), 10:0, 11:1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (10L, 11L))
    val expected = Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 1L)
    // replicate via the registry shape: run the same fixed-round update
    var l = scala.collection.mutable.Map(
      (Seq(1L, 2L, 3L, 4L, 10L, 11L).map(_ -> 0L)): _*)
    for (_ <- 1 to 6) {
      val upd = e.groupBy(_._2).map { case (v, es) =>
        v -> (es.map(x => l(x._1)).max + 1) }
      for ((v, ml) <- upd) l(v) = math.max(l(v), ml)
    }
    val census = l.values.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    assert(census == expected, s"replay $census want $expected")
    // and the distributed form over the same edges
    import org.apache.spark.sql.DataFrame
    val edf = e.toDF("lo", "hi")
    var ld: DataFrame = edf.select(col("lo").as("node"))
      .union(edf.select(col("hi").as("node"))).distinct()
      .withColumn("l", lit(0L))
    for (_ <- 1 to 6) {
      val upd = edf
        .join(ld.select(col("node").as("lo"), col("l").as("pl")), "lo")
        .groupBy(col("hi").as("node"))
        .agg((max(col("pl")) + lit(1L)).as("ml"))
      ld = ld.join(upd, Seq("node"), "left")
        .select(col("node"),
          greatest(col("l"), coalesce(col("ml"), lit(-1L))).as("l"))
    }
    val gotCensus = ld.groupBy(col("l")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCensus == expected, s"got $gotCensus want $expected")
  }
}
