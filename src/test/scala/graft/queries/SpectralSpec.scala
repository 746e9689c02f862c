package graft.queries

import graft.SparkSpec
import graft.Tables
import graft.ops.Graph
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("HITS exact integer scores on a 3-cycle-with-chord fixture") {
    import spark.implicits._
    // 1→2, 1→3, 2→3, 3→1: a1=(2:1, 3:2, 1:1); h1=(1:3, 2:2, 3:1);
    // a2=(2:3, 3:5, 1:1); h2=(1:8, 2:5, 3:1); a3=(2:8, 3:13, 1:1)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Graph.hits(e, "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(3L -> ((13L, 1L)), 2L -> ((8L, 5L)),
      1L -> ((1L, 8L))), s"got $got")
  }

  test("PCA power iteration matches a dense driver-side replay") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
    val dim = 64
    def quant(v: Seq[Float]): Array[Long] = {
      val sc = v.map(x => math.abs(x.toDouble)).max
      if (sc == 0) Array.fill(dim)(0L)
      else v.map(x => new java.math.BigDecimal(x.toDouble * 127.0 / sc)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray
    }
    val qs = rows.map(r => r.getLong(0) -> quant(r.getSeq[Float](1)))
    val g = Array.ofDim[Long](dim, dim)
    for ((_, q) <- qs; i <- 0 until dim; j <- 0 until dim)
      g(i)(j) += q(i) * q(j)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => new java.math.BigDecimal(x.toDouble * 1000000.0 / m)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    }
    val want = qs.map { case (id, q) =>
      id -> (0 until dim).map(i => q(i) * v(i)).sum
    }.sortBy { case (id, p) => (-math.abs(p), id) }.take(10).toSeq
    val got = Spectral.queries("q_pca_power")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("co-purchase lift output is internally consistent") {
    val out = Spectral.queries("q_copurchase_lift")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)), "pa < pb")
    assert(out.forall(r => r.getLong(2) >= 2), "support >= 2")
    // recompute N under the same power-buyer cap, re-derive every lift
    val cp = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    val n = cp.groupBy(col("cust")).agg(count(lit(1)).as("np"))
      .filter(col("np") <= 64).count()
    assert(out.forall { r =>
      r.getLong(5) == r.getLong(2) * n * 1000000L /
        (r.getLong(3) * r.getLong(4))
    }, "lift_ppm arithmetic")
  }
}
