package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinLastBefore: latest right at-or-before each left time, per key") {
    val left = Seq(
      (1L, "k1", 100L), (2L, "k1", 250L), (3L, "k1", 50L), (4L, "k2", 100L))
      .toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "k1", 100L), (11L, "k1", 200L), (12L, "k1", 100L), (20L, "k3", 10L))
      .toDF("rid", "k", "rt")
    val got = AsOf.joinLastBefore(left, right, "k", "k",
        col("lt"), col("rt"), Seq("rid"), "rid")
      .select(col("lid"), col("__match.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(1L) == 12L) // inclusive at t=100; tie → max rid (12 > 10)
    assert(got(2L) == 11L) // latest before 250
    assert(got(3L) == -1L) // nothing at or before 50
    assert(got(4L) == -1L) // key with no right rows
  }

  test("joinFirstAfter: earliest right at-or-after each left time, per key") {
    val left = Seq(
      (1L, "k1", 100L), (2L, "k1", 250L), (3L, "k1", 50L), (4L, "k2", 100L))
      .toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "k1", 100L), (11L, "k1", 200L), (12L, "k1", 100L), (20L, "k3", 10L))
      .toDF("rid", "k", "rt")
    val got = AsOf.joinFirstAfter(left, right, "k", "k",
        col("lt"), col("rt"), Seq("rid"), "rid")
      .select(col("lid"), col("__match.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(1L) == 10L) // inclusive at t=100; tie → MIN rid (10 < 12)
    assert(got(2L) == -1L) // nothing at or after 250
    assert(got(3L) == 10L) // earliest at-or-after 50 is t=100, min rid
    assert(got(4L) == -1L) // key with no right rows
  }
}
