package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class PivotAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val long = Seq(
    (1L, "a", 10.0), (1L, "a", 20.0), (1L, "b", 5.0), (2L, "b", 7.0))
    .toDF("k", "p", "v")

  test("groupAvg collapses duplicate measurements to the mean") {
    val got = PivotAgg.groupAvg(long, Seq("k", "p"), "v", "avg_v")
      .orderBy("k", "p").collect().toSeq
    assert(got == Seq(Row(1L, "a", 15.0), Row(1L, "b", 5.0), Row(2L, "b", 7.0)))
  }

  test("pivotAvg with explicit values yields a stable wide schema incl. absent columns") {
    val wide = PivotAgg.pivotAvg(long, "k", "p", "v", Seq("a", "b", "c"))
      .orderBy("k")
    assert(wide.columns.toSeq == Seq("k", "a", "b", "c"))
    assert(wide.collect().toSeq ==
      Seq(Row(1L, 15.0, 5.0, null), Row(2L, null, 7.0, null)))
  }

  test("reorderColumns: fixed prefix + sorted dynamic tail") {
    val df = Seq((1, 2, 3, 4)).toDF("id", "z", "m", "a")
    assert(PivotAgg.reorderColumns(df, Seq("id")).columns.toSeq ==
      Seq("id", "a", "m", "z"))
  }

  test("projectRename keeps and renames in one projection") {
    val df = Seq((1L, "x", true)).toDF("a", "b", "c")
    val got = Cleaning.projectRename(df, Seq("a" -> "ID", "b" -> "NAME"))
    assert(got.columns.toSeq == Seq("ID", "NAME"))
  }
}
