package graft
class ContractSpec extends SparkSpec {
  test("driver contract: no registry name collisions, entry returns rows") {
    val maps = Seq(graft.queries.Registry.queries,
      graft.queries.Extended.queries, graft.queries.Corpus.queries)
    val all = maps.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
    assert(SparkEntry.entry(spark).count() > 0)
    println(s"QUERIES=${all.size} ORACLES=${SparkEntry.oracleSql.size}")
  }
}
