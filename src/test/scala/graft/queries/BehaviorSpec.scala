package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("seq pattern: supports equal a brute-force first/last replay") {
    val rows = Behavior.queries("q_seq_pattern")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val nUsers = ev.size.toLong
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val want = ev.values.count { es =>
        val fa = es.filter(_._2 == a).map(_._3)
        val lb = es.filter(_._2 == b).map(_._3)
        fa.nonEmpty && lb.nonEmpty && fa.min < lb.max
      }.toLong
      assert(r.getLong(2) == want, s"support($a,$b)=${r.getLong(2)} want $want")
      assert(r.getLong(3) == want * 1000000L / nUsers)
    }
  }

  test("seq pattern: hardcoded type list equals the data's event_type universe") {
    // the pair pivot needs a static list on both the Spark and oracle
    // side; this tripwire is what notices a NEW event_type in the data
    // (which would otherwise silently vanish from both sides at once)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val inData = Tables.events(spark, d).select(col("event_type"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(inData == Behavior.SeqPatternTypes.toSet,
        s"$d event_type universe $inData != hardcoded ${Behavior.SeqPatternTypes}")
    }
  }

  test("reciprocity: brute-force set check") {
    val r = Behavior.queries("q_reciprocity")(spark, sf).head()
    val es = SynthGraph.edges(spark, sf).filter(col("x") =!= col("y"))
      .select(col("x"), col("y")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val recip = es.count { case (x, y) => es.contains((y, x)) }.toLong
    assert(r.getLong(0) == es.size.toLong)
    assert(r.getLong(1) == recip, s"recip ${r.getLong(1)} want $recip")
    assert(r.getLong(2) == recip * 1000000L / es.size)
  }

  test("quota: slots conserve and each class gets floor or floor+1") {
    val rows = Behavior.queries("q_quota_apportion")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == 1000L)
    val n = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val base = r.getLong(1) * 1000L / n
      assert(r.getLong(2) == base || r.getLong(2) == base + 1,
        s"${r.getString(0)} quota ${r.getLong(2)} not in {$base, ${base + 1}}")
    }
  }

  test("benford: digit shares replay; expectations sum to ~1e6") {
    val rows = Behavior.queries("q_benford")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val counts = Tables.lineitem(spark, sf)
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(_.getLong(0).toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == counts(d.toLong))
      assert(r.getLong(2) == counts(d.toLong) * 1000000L / n)
      val exp = math.round(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
      assert(r.getLong(3) == exp)
      assert(r.getLong(4) == math.abs(r.getLong(2) - exp))
    }
    // the nine Benford expectations are a distribution (±9 ppm rounding)
    assert(math.abs(rows.map(_.getLong(3)).sum - 1000000L) <= 9)
  }

  test("avg precision: replay from the scored frame ordering") {
    val r = Behavior.queries("q_avg_precision")(spark, sf).head()
    val sc = Evaluation.scoredForSpec(spark, sf)
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getLong(2)))
      .sortBy { case (id, _, s) => (-s, id) }
    var (j, apsum) = (0L, 0L)
    sc.zipWithIndex.foreach { case ((_, label, _), i) =>
      if (label) { j += 1; apsum += j * 1000000L / (i + 1) }
    }
    assert(r.getLong(0) == j)
    assert(r.getLong(1) == apsum / j, s"ap ${r.getLong(1)} want ${apsum / j}")
  }

  test("changepoint: split minimizes pooled SSE over all candidate days") {
    val r = Behavior.queries("q_changepoint")(spark, sf).head()
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect()
      .map(x => (x.getDate(0), x.getLong(1)))
    val n = daily.length.toLong
    val sTot = daily.map(_._2).sum
    var (sl, best) = (0L, (Long.MinValue, ""))
    daily.dropRight(1).zipWithIndex.foreach { case ((day, x), i) =>
      sl += x
      val nl = i + 1L
      val score = math.round(
        sl.toDouble * sl / nl + (sTot - sl).toDouble * (sTot - sl) / (n - nl))
      if (score > best._1) best = (score, day.toString)
    }
    assert(r.getDate(0).toString == best._2,
      s"split ${r.getDate(0)} want ${best._2}")
    assert(r.getLong(1) + r.getLong(2) == n)
    assert(r.getLong(5) == best._1)
  }

  test("entropy rate: exact replay from transition counts; bounded") {
    val r = Behavior.queries("q_entropy_rate")(spark, sf).head()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .groupBy(_._1)
    val trans = collection.mutable.Map[(String, String), Long]()
    ev.values.foreach { es =>
      val seq = es.sortBy(e => (e._3, e._4)).map(_._2)
      seq.zip(seq.tail).foreach(p =>
        trans(p) = trans.getOrElse(p, 0L) + 1L)
    }
    val byPrev = trans.groupBy(_._1._1).view.mapValues(_.values.sum)
    val num = trans.map { case ((a, _), c) =>
      c * math.round(math.log(c.toDouble / byPrev(a)) * 1e6)
    }.sum
    val n = trans.values.sum
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == -num, s"num ${r.getLong(1)} want ${-num}")
    assert(r.getLong(2) == -num / n)
    // entropy of a 5-state chain is bounded by ln 5
    assert(r.getLong(2) >= 0 && r.getLong(2) <= math.round(math.log(5.0) * 1e6))
  }
}
