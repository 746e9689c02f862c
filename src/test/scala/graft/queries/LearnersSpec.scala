package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class LearnersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("logreg: three preconditioned GD iterations replay exactly") {
    val r = Learners.queries("q_logreg_gd")(spark, sf).head()
    val rows = Tables.lineitem(spark, sf)
      .select(when(col("l_returnflag") === "R", 1L).otherwise(0L),
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = rows.length.toLong
    val sq = rows.map(t => t._2 * t._2).sum.toDouble
    val sd = rows.map(t => t._3 * t._3).sum.toDouble
    def halfUp(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var (w0, w1, w2) = (0L, 0L, 0L)
    for (_ <- 1 to 3) {
      var (g0, g1, g2) = (0L, 0L, 0L)
      rows.foreach { case (y, q, d) =>
        val z = (w0 + w1 * q + w2 * d).toDouble / 1e6
        val res = math.round((1.0 / (1.0 + math.exp(-z)) - y) * 1e6)
        g0 += res; g1 += res * q; g2 += res * d
      }
      w0 -= halfUp(g0.toDouble / n)
      w1 -= halfUp(g1.toDouble / sq)
      w2 -= halfUp(g2.toDouble / sd)
    }
    assert(r.getLong(0) == w0 && r.getLong(1) == w1 && r.getLong(2) == w2,
      s"weights (${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}) " +
        s"want ($w0,$w1,$w2)")
    // the trained model must beat the w=0 baseline loss n·ln(2)·1e6
    val baseline = math.round(math.log(2.0) * 1e6) * n
    assert(r.getLong(3) < baseline,
      s"loss ${r.getLong(3)} not below baseline $baseline")
    assert(r.getLong(5) == n)
    assert(r.getLong(4) > 0 && r.getLong(4) <= n)
  }

  test("naive bayes: confusion rows conserve the per-lang doc counts") {
    val rows = Learners.queries("q_naive_bayes")(spark, sf).collect()
    val perLang = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(got == perLang, s"confusion row sums $got want $perLang")
    // predictions must be languages that exist
    rows.foreach(r => assert(perLang.contains(r.getString(1))))
    // the classifier must beat chance on the dominant class: the
    // majority of english docs should be predicted en (hash buckets
    // separate zh/en strongly on this corpus)
    val enRight = rows.filter(r =>
      r.getString(0) == "en" && r.getString(1) == "en")
      .map(_.getLong(2)).sum
    assert(enRight * 2 > perLang("en"),
      s"en hit rate too low: $enRight of ${perLang("en")}")
  }

  test("apriori: lattice path equals the naive brute-force enumeration") {
    val got = Learners.queries("q_apriori_triples")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val kept = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .filter(_._2.length <= 64)
    val support = collection.mutable.Map[(Long, Long, Long), Long]()
    kept.values.foreach { ps =>
      for {
        i <- ps.indices; j <- (i + 1) until ps.length
        k <- (j + 1) until ps.length
      } {
        val key = (ps(i), ps(j), ps(k))
        support(key) = support.getOrElse(key, 0L) + 1L
      }
    }
    val want = support.toSeq.filter(_._2 >= 2)
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy { case (a, b, c, s) => (-s, a, b, c) }.take(15)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }
}
