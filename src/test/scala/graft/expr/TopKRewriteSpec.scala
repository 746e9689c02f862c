package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** WindowTopKToAggregate: the rewrite must (a) fire on exactly the
  * row_number-filter idiom, (b) leave everything else untouched, and
  * (c) be value-identical to the window form under a total order.
  */
class TopKRewriteSpec extends SparkSpec {

  private def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  private def windowForm(k: Int): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    li.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  private def rewrite(df: DataFrame): LogicalPlan =
    GraftRules.WindowTopKToAggregate(df.queryExecution.optimizedPlan)

  test("rewrite removes the Window and matches the window form row-for-row") {
    val df = windowForm(7)
    val plan = rewrite(df)
    assert(!plan.exists(_.isInstanceOf[LWindow]), plan.toString)
    val got = GraftShim.ofRows(spark, plan)
      .orderBy(col("l_returnflag"), col("rn")).collect().toSeq
    val want = df.orderBy(col("l_returnflag"), col("rn")).collect().toSeq
    assert(got == want) // total order → unique answer, rn included
  }

  test("every bound form fires: rn <= k, rn < k, rn = 1") {
    for ((f, expectedK) <- Seq[(DataFrame => DataFrame, Int)](
      (d => d.filter(col("rn") <= 3), 3),
      (d => d.filter(col("rn") < 4), 3),
      (d => d.filter(col("rn") === 1), 1))) {
      val base = {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"))
        li.withColumn("rn", row_number().over(w))
      }
      val df = f(base)
      val plan = rewrite(df)
      assert(!plan.exists(_.isInstanceOf[LWindow]), s"k=$expectedK: $plan")
      assert(GraftShim.ofRows(spark, plan).count() ==
        df.count()) // same cardinality as the window form
      assert(GraftShim.ofRows(spark, plan)
        .groupBy("l_returnflag").count()
        .agg(max("count")).head().getLong(0) <= expectedK)
    }
  }

  test("a Long-literal bound (rn <= 5L, analyzed as a cast) still fires") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
    val df = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(5L))
    val plan = rewrite(df)
    assert(!plan.exists(_.isInstanceOf[LWindow]), plan.toString)
    assert(GraftShim.ofRows(spark, plan).count() == df.count())
  }

  test("non-matching shapes are left untouched") {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))
    // rank() is not row_number: ties share numbers, the rewrite's k-cut
    // would be wrong
    val rankForm = li.withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(rewrite(rankForm).exists(_.isInstanceOf[LWindow]))
    // no filter bound → nothing to push into an aggregate
    val unbounded = li.withColumn("rn", row_number().over(w))
    assert(rewrite(unbounded).exists(_.isInstanceOf[LWindow]))
    // giant k → the bounded buffer would not be bounded; keep the window
    val hugeK = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1000000)
    assert(rewrite(hugeK).exists(_.isInstanceOf[LWindow]))
  }

  test("downstream references survive the rewrite (attribute ids preserved)") {
    val df = windowForm(5)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("top_sum"), max(col("rn")).as("max_rn"))
    val plan = GraftRules.WindowTopKToAggregate(df.queryExecution.optimizedPlan)
    assert(!plan.exists(_.isInstanceOf[LWindow]), plan.toString)
    val got = GraftShim.ofRows(spark, plan).orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq
    val want = df.orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("BoundedTopKRows partial buffers stay bounded and merge correctly") {
    // many partitions, tiny k: the answer must be the global top-k per
    // group regardless of how partial buffers were laid out
    val df = windowForm(2)
    val plan = rewrite(df)
    val repartitioned = GraftShim.ofRows(spark, plan)
    val viaAgg = repartitioned.orderBy(col("l_returnflag"), col("rn"))
      .select("l_returnflag", "l_orderkey", "rn").collect().toSeq
    val viaWindow = df.orderBy(col("l_returnflag"), col("rn"))
      .select("l_returnflag", "l_orderkey", "rn").collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
