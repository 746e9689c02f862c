package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("closed-form OLS agrees with a driver-side Gaussian elimination") {
    val r = Stats.queries("q_ols_closed")(spark, sf).head()
    val got = Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val rows = Tables.lineitem(spark, sf).select(
      col("l_quantity").cast("long"),
      floor(col("l_discount") * 100 + 0.5).cast("long"),
      floor(col("l_extendedprice")).cast("long")).collect()
    val xs = rows.map(r => Array(1.0, r.getLong(0).toDouble,
      r.getLong(1).toDouble))
    val ys = rows.map(_.getLong(2).toDouble)
    // normal equations solved by straight Gaussian elimination — an
    // independent numeric path from the Cramer integer solve
    val a = Array.ofDim[Double](3, 4)
    for ((x, y) <- xs.zip(ys); i <- 0 until 3) {
      for (j <- 0 until 3) a(i)(j) += x(i) * x(j)
      a(i)(3) += x(i) * y
    }
    for (p <- 0 until 3) {
      val pivot = a(p)(p)
      for (j <- p to 3) a(p)(j) /= pivot
      for (i <- 0 until 3 if i != p) {
        val f = a(i)(p)
        for (j <- p to 3) a(i)(j) -= f * a(p)(j)
      }
    }
    val want = Array(a(0)(3), a(1)(3), a(2)(3))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-3, s"got ${got.toSeq} want ${want.toSeq}")
    }
  }

  test("Welch t-test agrees with a direct two-pass computation") {
    val r = Stats.queries("q_ab_ttest")(spark, sf).head()
    def vals(t: String): Array[Double] =
      Tables.events(spark, sf).filter(col("event_type") === t)
        .select(floor(col("value") * 1000 + 0.5).cast("long"))
        .collect().map(_.getLong(0).toDouble)
    val (a, b) = (vals("purchase"), vals("view"))
    def meanVar(v: Array[Double]): (Double, Double) = {
      val m = v.sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val ((ma, va), (mb, vb)) = (meanVar(a), meanVar(b))
    val t = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    assert(math.abs(r.getDouble(4) - t) < 1e-3,
      s"t ${r.getDouble(4)} want $t")
    assert(r.getBoolean(6) == (math.abs(t) > 1.96))
  }

  test("Gini matches the exact sorted-rank formula, bounded in [0,1)") {
    val r = Stats.queries("q_gini")(spark, sf).head()
    val xs = Tables.orders(spark, sf)
      .select(col("o_custkey"), floor(col("o_totalprice")).cast("long").as("xd"))
      .groupBy(col("o_custkey")).agg(sum(col("xd")).as("x"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
      .sortBy { case (c, x) => (x, c) }.map(_._2)
    val n = xs.length.toLong
    val s0 = xs.map(BigInt(_)).sum
    val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val want = ((BigInt(2) * s1 - BigInt(n + 1) * s0) * 10000 /
      (BigInt(n) * s0)).toLong
    assert(r.getLong(0) == n)
    assert(r.getLong(2) == want, s"gini ${r.getLong(2)} want $want")
    assert(r.getLong(2) >= 0 && r.getLong(2) < 10000)
  }
}
