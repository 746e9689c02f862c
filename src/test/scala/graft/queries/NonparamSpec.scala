package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class NonparamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spearman: midrank pearson replays exactly in BigInt") {
    val r = Nonparam.queries("q_spearman")(spark, sf).head()
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def mid2(vs: Seq[Long]): Map[Long, Long] = {
      val counts = vs.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var before = 0L
      counts.map { case (v, c) =>
        val m = 2 * before + c + 1; before += c; v -> m }.toMap
    }
    val mx = mid2(xs.map(_._1)); val my = mid2(xs.map(_._2))
    val n = BigInt(xs.length)
    val rx = xs.map(t => BigInt(mx(t._1)))
    val ry = xs.map(t => BigInt(my(t._2)))
    val (sx, sy) = (rx.sum, ry.sum)
    val sxx = rx.map(v => v * v).sum
    val syy = ry.map(v => v * v).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val want = BigDecimal(
      (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == xs.length)
    assert(math.abs(r.getDouble(1) - want) < 1e-12,
      s"rho ${r.getDouble(1)} want $want")
    assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("grouped ols: one segment's closed form replays in BigInt") {
    val rows = Nonparam.queries("q_grouped_ols")(spark, sf).collect()
    assert(rows.length == 5)
    val seg = rows.head.getString(0)
    val xs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg)
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(x => (BigInt(x.getLong(0)), BigInt(x.getLong(1))))
    val n = BigInt(xs.length)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum
    val sxy = xs.map(t => t._1 * t._2).sum
    val slope = BigDecimal((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getLong(1) == xs.length)
    assert(math.abs(rows.head.getDouble(2) - slope) < 1e-12,
      s"slope ${rows.head.getDouble(2)} want $slope")
    rows.foreach(r => assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1))
  }

  test("runs test: sequential sign-run replay") {
    val r = Nonparam.queries("q_runs_test")(spark, sf).head()
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val signs = daily.zip(daily.tail).map { case (a, b) => b - a }
      .filter(_ != 0).map(_ > 0)
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(r.getLong(0) == signs.count(identity))
    assert(r.getLong(1) == signs.count(!_))
    assert(r.getLong(2) == runs, s"runs ${r.getLong(2)} want $runs")
  }

  test("partial corr: |r| bounds and BigInt nine-sum replay of r_xy") {
    val r = Nonparam.queries("q_partial_corr")(spark, sf).head()
    assert(math.abs(r.getDouble(1)) <= 1.0 &&
      math.abs(r.getDouble(2)) <= 1.0)
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(t => (BigInt(t.getLong(0)), BigInt(t.getLong(1))))
    val n = BigInt(xs.length)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum
    val syy = xs.map(t => t._2 * t._2).sum
    val sxy = xs.map(t => t._1 * t._2).sum
    val want = BigDecimal((n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(1) - want) < 1e-12,
      s"r_xy ${r.getDouble(1)} want $want")
  }

  test("lorenz: shares conserve, cumulative is monotone and ends at ~1e6") {
    val rows = Nonparam.queries("q_lorenz")(spark, sf).collect()
    assert(rows.map(_.getInt(0).toLong).toSeq == (1L to 10L))
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last >= 999990L && cums.last <= 1000000L)
    // deciles are ordered poorest-to-richest: shares non-decreasing
    val shares = rows.map(_.getLong(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"shares not monotone: ${shares.toSeq}")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sf).select(col("o_custkey")).distinct().count())
  }

  test("brier: exact micro replay; degenerate bounds") {
    val r = Nonparam.queries("q_brier")(spark, sf).head()
    val sc = Evaluation.scoredForSpec(spark, sf)
      .collect().map(x => (x.getBoolean(1), x.getLong(2)))
    val tsum = sc.map { case (label, s) =>
      val p = 1.0 / (1.0 + math.exp(-(s.toDouble / 1e6)))
      val y = if (label) 1.0 else 0.0
      BigDecimal(math.pow(p - y, 2) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    assert(r.getLong(0) == sc.length)
    assert(r.getLong(1) == tsum / sc.length,
      s"brier ${r.getLong(1)} want ${tsum / sc.length}")
    assert(r.getLong(1) >= 0 && r.getLong(1) <= 1000000L)
  }

  test("centroid similarity: 45 pairs, self-consistent bounds") {
    val rows = Nonparam.queries("q_centroid_similarity")(spark, sf).collect()
    assert(rows.length == 45) // C(10,2)
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"cosine: $r")
    }
  }

  test("gap quantiles: ordered percentiles and gap conservation") {
    val rows = Nonparam.queries("q_gap_quantiles")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4),
        s"percentiles out of order: $r")
    }
    // total gaps = events − distinct (user, type) chains
    val ev = Tables.events(spark, sf)
    val want = ev.count() -
      ev.select(col("user_id"), col("event_type")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == want)
  }
}
