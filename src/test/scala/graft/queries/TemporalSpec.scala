package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chi-square statistic matches a driver replay of the cell formula") {
    val r = Temporal.queries("q_chi_square")(spark, sf).head()
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")))
      .collect().map(x => (x.getString(0), x.getInt(1)))
    val n = cells.length.toLong
    val byCell = cells.groupBy(identity).view.mapValues(_.length.toLong)
    val rowT = cells.groupBy(_._1).view.mapValues(_.length.toLong)
    val colT = cells.groupBy(_._2).view.mapValues(_.length.toLong)
    val chi2 = byCell.map { case ((et, h), o) =>
      val dev = (BigInt(o) * n - BigInt(rowT(et)) * colT(h)).toDouble
      math.round(dev * dev /
        (BigInt(rowT(et)) * BigInt(colT(h)) * n).toDouble * 1e6)
    }.sum
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == (rowT.size - 1).toLong * (colT.size - 1))
    assert(r.getLong(2) == chi2, s"chi2 ${r.getLong(2)} want $chi2")
    // Cramér's V lives in [0, 1]
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("adamic-adar: scores match brute force and exclude existing edges") {
    val rows = Temporal.queries("q_adamic_adar")(spark, sf).collect()
    assert(rows.length == 20)
    val e = SynthGraph.edges(spark, sf).filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")), greatest(col("x"), col("y")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = e.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def aa(u: Long, v: Long): Long =
      (adj(u) & adj(v)).toSeq.map(w =>
        math.round(1e6 / math.log(adj(w).size.toDouble))).sum
    rows.foreach { r =>
      val (u, v, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!e.contains((u, v)), s"existing edge predicted: ($u,$v)")
      assert(s == aa(u, v), s"score $s want ${aa(u, v)} for ($u,$v)")
    }
    // scores are the global top: no non-edge pair beats the 20th
    val floor20 = rows.last.getLong(2)
    val all = adj.keys.toSeq.sorted
    val beats = for {
      u <- all; v <- all if u < v && !e.contains((u, v))
      s = aa(u, v) if s > floor20
    } yield (u, v)
    assert(beats.length < 20, s"more than 19 pairs beat the reported floor")
  }

  test("markov transitions: probabilities sum to ~1e6 per source state") {
    val rows = Temporal.queries("q_markov_transition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val total = rs.map(_.getLong(3)).sum
      // integer-truncated ppm shares: within |types| of exactly 1e6
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"$prev p_ppm sums to $total")
      val nTot = rs.map(_.getLong(2)).sum
      rs.foreach(r =>
        assert(r.getLong(3) == r.getLong(2) * 1000000L / nTot))
    }
  }

  test("kaplan-meier: monotone non-increasing, replayed product matches") {
    val rows = Temporal.queries("q_kaplan_meier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getDouble(3))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-9 },
      "S(t) must be non-increasing")
    // replay the micro-nat prefix exactly
    var cum = 0L
    var hitZero = false
    rows.foreach { r =>
      val (nr, d) = (r.getLong(1), r.getLong(2))
      assert(d > 0 && nr >= d)
      if (nr == d) hitZero = true
      else cum += math.round(math.log((nr - d).toDouble / nr) * 1e6)
      val want =
        if (hitZero) 0.0
        else BigDecimal(math.exp(cum / 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 1e-12,
        s"s_km ${r.getDouble(3)} want $want at dur ${r.getLong(0)}")
    }
    // n_risk is total users at the first support point minus prior exits
    val users = Tables.events(spark, sf).select(col("user_id")).distinct()
      .count()
    assert(rows.head.getLong(1) <= users)
  }

  test("acf: lag-0 self-check via denominator and |r| <= 1") {
    val rows = Temporal.queries("q_acf")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9,
        s"acf out of range: $r")
      assert(r.getLong(1) > 0, s"no pairs at lag ${r.getInt(0)}")
    }
    // consecutive lags lose at most one pair per calendar gap
    val np = rows.map(_.getLong(1))
    assert(np.zip(np.tail).forall { case (a, b) => b <= a },
      "pair count must be non-increasing in k")
  }

  test("watermark lateness: bucketed running max equals a sequential replay") {
    val rows = Temporal.queries("q_watermark_lateness")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    var hwm = 0L
    val agg = collection.mutable.Map[String, (Long, Long, Long)]()
    ev.foreach { case (_, et, t) =>
      val late = t < hwm - 600L * 1000000L
      val lateSec = if (late) (hwm - 600L * 1000000L - t) / 1000000L else 0L
      val (n, nl, ml) = agg.getOrElse(et, (0L, 0L, 0L))
      agg(et) = (n + 1, nl + (if (late) 1L else 0L), math.max(ml, lateSec))
      hwm = math.max(hwm, t)
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nl, ml) = agg(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nl && r.getLong(3) == ml,
        s"${r.getString(0)}: got (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)}) want ($n,$nl,$ml)")
    }
  }

  test("ohlc: open/close match a driver sort; invariants hold") {
    val rows = Temporal.queries("q_ohlc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(unix_micros(date_trunc("hour", col("ts"))),
        unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 1000 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val bar = ev(r.getLong(0)).sortBy(t => (t._2, t._3))
      assert(r.getLong(1) == bar.head._4, s"open mismatch at ${r.getLong(0)}")
      assert(r.getLong(4) == bar.last._4, s"close mismatch at ${r.getLong(0)}")
      assert(r.getLong(2) == bar.map(_._4).max)
      assert(r.getLong(3) == bar.map(_._4).min)
      assert(r.getLong(5) == bar.length)
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(2) >= r.getLong(4))
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("twap: per-user weighted mean replays exactly in BigInt") {
    val rows = Temporal.queries("q_twap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 1000 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val seq = ev(r.getLong(0)).sortBy(t => (t._2, t._3))
      val spans = seq.zip(seq.tail)
      val num = spans.map { case (a, b) =>
        BigInt(a._4) * BigInt(b._2 - a._2) }.sum
      val den = spans.map { case (a, b) => BigInt(b._2 - a._2) }.sum
      assert(r.getLong(1) == spans.length)
      assert(BigInt(r.getLong(2)) == num / den,
        s"twap ${r.getLong(2)} want ${num / den} for user ${r.getLong(0)}")
    }
    val tw = rows.map(_.getLong(2))
    assert(tw.zip(tw.tail).forall { case (a, b) => a >= b })
  }

  test("weighted median: brute-force cumulative rule agrees") {
    val r = Temporal.queries("q_weighted_median")(spark, sf).head()
    val pw = Tables.lineitem(spark, sf)
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val w = pw.map(_._2).sum
    val thr = (w + 1) / 2
    var cum = 0L
    val med = pw.collectFirst {
      case (p, wt) if { cum += wt; cum >= thr } => p }.get
    assert(r.getLong(0) == w && r.getLong(1) == med,
      s"got (${r.getLong(0)},${r.getLong(1)}) want ($w,$med)")
  }

  test("ewma: fixed-point recursion replays exactly from the daily series") {
    val rows = Temporal.queries("q_ewma")(spark, sf).collect()
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    assert(rows.length == daily.length)
    var s = -1L
    daily.zip(rows).foreach { case ((day, x), r) =>
      s = if (s < 0) x * 65536
          else (8192 * (x * 65536) + 57344 * s) / 65536
      assert(r.getDate(0) == day)
      assert(r.getLong(1) == s * 1000 / 65536,
        s"ewma ${r.getLong(1)} want ${s * 1000 / 65536} at $day")
    }
  }
}
