package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("confusion matrix conserves the corpus and derives P/R/F1 exactly") {
    val r = Evaluation.queries("q_confusion")(spark, sf).head()
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn ==
      Tables.documents(spark, sf).count(), "docs conserved")
    assert(r.getLong(4) == tp * 1000000L / (tp + fp))
    assert(r.getLong(5) == tp * 1000000L / (tp + fn))
    val (p, rec) = (r.getLong(4), r.getLong(5))
    assert(r.getLong(6) ==
      (if (p + rec == 0) 0L else 2 * p * rec / (p + rec)))
  }

  test("calibration deciles conserve docs; mean score rises with decile") {
    val rows = Evaluation.queries("q_calibration")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    val means = rows.map(_.getLong(2))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"mean score must be non-decreasing across deciles: ${means.toSeq}")
  }

  test("AUC equals exact pairwise concordance counting") {
    val r = Evaluation.queries("q_auc")(spark, sf).head()
    val scoredRows = Evaluation.scoredForSpec(spark, sf).collect()
      .map(x => (x.getBoolean(1), x.getLong(2)))
    val pos = scoredRows.filter(_._1).map(_._2)
    val neg = scoredRows.filterNot(_._1).map(_._2)
    val conc2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val want = conc2 * 1000000L / (2L * pos.length * neg.length)
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    assert(r.getLong(2) == want, s"auc ${r.getLong(2)} want $want")
  }

  test("ANOVA F matches a direct driver-side computation") {
    val r = Evaluation.queries("q_anova_f")(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 1000 + 0.5).cast("long"))
      .collect().map(x => x.getString(0) -> x.getLong(1).toDouble)
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = vals.length
    val gm = vals.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - gm) * (m - gm) }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    // the query rounds F to 4 decimals — compare at that granularity
    assert(math.abs(r.getDouble(3) - f) <= 5e-5 + f * 1e-9,
      s"F ${r.getDouble(3)} want $f")
  }

  test("decision stump matches the brute-force split search") {
    val r = Evaluation.queries("q_decision_stump")(spark, sf).head()
    val g = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val (tn, ts) = (g.map(_._2).sum, g.map(_._3).sum)
    val best = g.dropRight(1).scanLeft((0L, 0L, 0L)) {
      case ((_, nl, sl), (q, n, sy)) => (q, nl + n, sl + sy)
    }.drop(1).map { case (q, nl, sl) =>
      val (nr, sr) = (tn - nl, ts - sl)
      (q, nl, nr, sl, sr,
        sl.toDouble * sl / nl + sr.toDouble * sr / nr)
    }.maxBy { case (q, _, _, _, _, v) => (v, -q) }
    assert(r.getLong(0) == best._1, s"split ${r.getLong(0)} want ${best._1}")
    assert(r.getLong(1) == best._2 && r.getLong(2) == best._3)
    assert(r.getLong(3) == best._4 * 1000000L / best._2)
    assert(r.getLong(4) == best._5 * 1000000L / best._3)
  }
}
