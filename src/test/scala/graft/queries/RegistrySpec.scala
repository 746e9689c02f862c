package graft.queries

import graft.SparkSpec

/** Every registry query must execute and return rows at sf0.001, and
  * every oracle key must reference a declared query.
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("driver smoke contract: SparkEntry.entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  Registry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }
}
