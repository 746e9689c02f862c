package graft.queries

import graft.SparkSpec
import graft.Tables
import graft.ops.Layout
import org.apache.spark.sql.functions._

class PhysicalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom join: no false negatives; counts reconcile") {
    val r = Physical.queries("q_bloom_join")(spark, sf).head()
    val (nProbe, nPass, nMember, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nProbe == Tables.orders(spark, sf).count())
    assert(nPass <= nProbe && nFp <= nPass)
    // no-false-negatives theorem: every true member passes, so the
    // passing set splits exactly into members + false positives
    assert(nPass - nFp == nMember,
      s"pass $nPass - fp $nFp != member $nMember")
    // exact member count from an independent semi-join
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(nMember == want, s"member $nMember want $want")
  }

  test("hilbert: bits=4 walk is a grid-adjacent permutation of 0..255") {
    // exhaustive check of the defining curve property on the full grid
    val cells = spark.range(0, 256)
      .select((col("id") % 16).as("qx"), expr("id div 16").as("qy"))
    val walked = Layout.withHilbert(cells, "qx", "qy", 4, "h")
      .select(col("h"), col("qx"), col("qy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(walked.map(_._1).toSeq == (0L until 256L),
      "h must be a permutation of 0..255")
    walked.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"consecutive cells not grid-adjacent: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert: query output is h-sorted and matches a driver replay") {
    val rows = Physical.queries("q_hilbert_layout")(spark, sf).collect()
    assert(rows.length == 100)
    val hs = rows.map(_.getLong(2))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
    // driver replay of the xy2d walk on the first row's quantized cell
    val li = Tables.lineitem(spark, sf)
    val Array(st) = li.agg(
      min(col("l_extendedprice")).cast("double"),
      max(col("l_extendedprice")).cast("double"),
      min(col("l_quantity")).cast("double"),
      max(col("l_quantity")).cast("double")).collect()
    def quant(v: Double, mn: Double, mx: Double): Long =
      if (mn == mx) 0L
      else math.min(math.max(math.floor((v - mn) / (mx - mn) * 256), 0), 255)
        .toLong
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val first = rows.head
    val src = li.filter(col("l_orderkey") === first.getLong(0) &&
        col("l_linenumber") === first.getInt(1))
      .select(col("l_extendedprice"), col("l_quantity")).head()
    val h = xy2d(
      quant(src.getDouble(0), st.getDouble(0), st.getDouble(1)),
      quant(src.getDouble(1), st.getDouble(2), st.getDouble(3)))
    assert(first.getLong(2) == h, s"h ${first.getLong(2)} want $h")
  }
}
