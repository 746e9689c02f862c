package graft.queries

import graft.{SparkSpec, Tables}
import graft.ops.{Graph, TextOps}
import org.apache.spark.sql.functions._

/** Engine-local invariants for the Mining registry batch — the
  * properties the value oracle can't see: prefix-filter losslessness
  * against the brute-force join, label-propagation convergence on a
  * known topology, projection determinism under repartitioning.
  */
class MiningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("prefix-filtered similarity join equals the brute-force all-pairs join") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ws"))
    val a = sets.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = sets.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("inter"),
        size(array_union(col("wa"), col("wb"))).cast("long").as("uni"))
      .filter(col("inter") * 3 >= col("inter") + col("uni")) // 3i ≥ |A|+|B|
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val pref = Mining.queries("q_simjoin_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(pref == brute, s"prefix filter must be lossless: " +
      s"missing=${(brute -- pref).take(5)} extra=${(pref -- brute).take(5)}")
    assert(pref.nonEmpty, "fixture must contain near-duplicate documents")
  }

  test("label propagation: two disjoint triangles converge to min-id communities") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("s", "d")
    val labels = Graph.labelPropagation(edges, "s", "d", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $labels")
  }

  test("label propagation is partitioning-invariant (sync argmax is total-ordered)") {
    val li = Tables.lineitem(spark, sf).limit(2000)
    val e = li.select((col("l_orderkey") % 97).as("s"),
      ((col("l_partkey") * 31 + col("l_linenumber")) % 97).as("d"))
    def run(parts: Int) =
      Graph.labelPropagation(e.repartition(parts), "s", "d", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("random projection: deterministic under repartitioning, 16 components per vector") {
    val q = Mining.queries("q_random_projection")
    val base = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nVecs = base.keys.map(_._1).toSet.size
    assert(base.size == nVecs * 16, "every vector projects to exactly 16 components")
    val again = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(base == again)
  }

  test("shipping priority: top-10, strictly ordered by revenue desc then orderkey") {
    val rows = Mining.queries("q_shipping_priority")(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(r => (r.getLong(3), r.getLong(0)))
    val sorted = revs.sortBy { case (rev, k) => (-rev, k) }.toSeq
    assert(revs.toSeq == sorted, "output must be (revenue desc, orderkey asc)")
    assert(revs.forall(_._1 > 0L))
  }
}
