package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: DataFrame, col0: String, m: Int) =
    GraftShim.column(FreqItemsAgg(
      GraftShim.expression(col(col0)), m).toAggregateExpression())

  test("capacity >= distinct items → exact counts") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("t")
    val m = df.select(sketch(df, "t", 16).as("sk"))
      .head().getMap[String, Long](0)
    assert(m == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("MG bound holds for EVERY token on the real corpus, any partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (parts <- Seq(1, 17)) {
      val toks = docs.repartition(parts)
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      val cap = 64
      val skRow = toks.agg(sketch(toks, "tok", cap).as("sk"),
        count(lit(1)).as("n")).head()
      val sk = skRow.getMap[String, Long](0)
      val n = skRow.getLong(1)
      val exact = toks.groupBy("tok").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val slack = n / (cap + 1) + 1
      exact.foreach { case (tok, c) =>
        val est = sk.getOrElse(tok, 0L)
        assert(est <= c, s"overcount: $tok est=$est true=$c")
        assert(est >= c - slack, s"undercount past bound: $tok est=$est true=$c slack=$slack")
      }
      // anything with frequency above the slack is guaranteed present
      exact.filter(_._2 > slack).keys.foreach { tok =>
        assert(sk.contains(tok), s"guaranteed heavy hitter missing: $tok")
      }
      // the sketch never exceeds its capacity
      assert(sk.size <= cap)
    }
  }
}
