package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class InferenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("KS statistic equals the brute-force supremum CDF gap") {
    val r = Inference.queries("q_ks_test")(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(floor(col("value") * 1000 + 0.5).cast("long"),
        (col("event_type") === "purchase"))
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val a = vals.filter(_._2).map(_._1).sorted
    val b = vals.filterNot(_._2).map(_._1).sorted
    val points = (a ++ b).distinct.sorted
    val best = points.map { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      (math.abs(c1 * b.length - c2 * a.length), v)
    }.maxBy { case (d, v) => (d, -v) }
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    assert(r.getLong(2) == best._2, s"argmax ${r.getLong(2)} want ${best._2}")
    assert(r.getLong(3) ==
      best._1 * 1000000L / (a.length.toLong * b.length),
      s"d_ppm ${r.getLong(3)}")
  }

  test("MI cells conserve the corpus; scores match a driver replay") {
    val rows = Inference.queries("q_mi_features")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
        == total, s"cells must sum to the corpus: $r")
      val Seq(n11, n10, n01, n00) = (1 to 4).map(r.getLong)
      def term(n: Long, rr: Long, c: Long): Long =
        if (n == 0) 0L
        else new java.math.BigDecimal(
          (n.toDouble / total) * math.log(n.toDouble * total /
            (rr.toDouble * c)) * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val np = n11 + n01
      val nn = n10 + n00
      val want = term(n11, n11 + n10, np) + term(n10, n11 + n10, nn) +
        term(n01, n01 + n00, np) + term(n00, n01 + n00, nn)
      assert(r.getLong(5) == want, s"mi ${r.getLong(5)} want $want: $r")
    }
    val mis = rows.map(_.getLong(5))
    assert(mis.zip(mis.tail).forall { case (x, y) => x >= y },
      "top-10 must be sorted desc")
  }
}
