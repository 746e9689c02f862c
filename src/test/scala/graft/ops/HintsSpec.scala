package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Size-gated broadcast (r12 verdict item 2): the SAME join plans
  * BroadcastHashJoin under the row gate and ShuffledHashJoin past it —
  * the comment-only "at 100 TB this falls back to a shuffle join"
  * promise, enforced and plan-locked in both regimes. Results must be
  * identical either way (a hint is never a semantic change).
  */
class HintsSpec extends SparkSpec {

  private def li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  private def joined(dim: org.apache.spark.sql.DataFrame) =
    li.select(col("l_orderkey"), col("l_quantity"))
      .join(dim, Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

  private def withThreshold[A](rows: Long)(body: => A): A = {
    spark.conf.set(Hints.MaxRowsConfKey, rows.toString)
    try body finally spark.conf.unset(Hints.MaxRowsConfKey)
  }

  test("small regime: within the row gate the join plans a broadcast") {
    withThreshold(1000000L) {
      val dim = li.select(col("l_orderkey")).distinct().limit(50)
      val (gated, d) = Hints.sizeGatedBroadcastWithDecision(dim)
      assert(d.broadcasted && d.rows == 50)
      val q = joined(gated)
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(q.head().getLong(0) > 0)
    }
  }

  test("large regime: past the row gate the SAME join plans " +
      "ShuffledHashJoin (no broadcast, no sort-merge), same result") {
    val dim = li.select(col("l_orderkey")).distinct().limit(50)
    val small = withThreshold(1000000L) {
      joined(Hints.sizeGatedBroadcast(dim)).head()
    }
    withThreshold(10L) {
      val (gated, d) = Hints.sizeGatedBroadcastWithDecision(dim)
      assert(!d.broadcasted && d.rows == 50 && d.threshold == 10L)
      val q = joined(gated)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("BroadcastHashJoin"))
      assert(q.head() == small) // hint, not a semantic change
    }
  }

  test("the gated query sites keep their oracle rows in BOTH regimes " +
      "(q_apriori_triples F2, q_adamic_adar edge set)") {
    val sf = "/root/testdata/sf0.001"
    def rows(name: String) = graft.SparkEntry
      .queries(name)(spark, sf).collect().toSeq
    val (apB, aaB) = withThreshold(100000000L) {
      (rows("q_apriori_triples"), rows("q_adamic_adar"))
    }
    withThreshold(1L) { // force the shuffle regime everywhere
      assert(rows("q_apriori_triples") == apB)
      assert(rows("q_adamic_adar") == aaB)
      // and the forced regime really is shuffle-shaped: no broadcast of
      // the gated F2 in the executed plan
      val p = graft.SparkEntry.queries("q_apriori_triples")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"))
    }
  }
}
