package graft
class ContractSpec extends SparkSpec {
  test("driver contract: no registry name collisions, entry returns rows") {
    // iterate the entries Seqs, not the derived Maps — .toMap silently
    // collapses a within-registry duplicate before any Map-level check
    val entrySeqs = Seq(graft.queries.Registry.entries,
      graft.queries.Extended.entries, graft.queries.Corpus.entries,
      graft.queries.Analytics.entries, graft.queries.Mining.entries,
      graft.queries.Curation.entries, graft.queries.Frontier.entries,
      graft.queries.Spectral.entries, graft.queries.Stats.entries,
      graft.queries.Structure.entries, graft.queries.Evaluation.entries,
      graft.queries.Inference.entries, graft.queries.Temporal.entries,
      graft.queries.Learners.entries, graft.queries.Physical.entries,
      graft.queries.Behavior.entries, graft.queries.Augment.entries, graft.queries.Nonparam.entries)
    val all = entrySeqs.flatMap(_.map(_._1))
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
    assert(SparkEntry.entry(spark).count() > 0)
    println(s"QUERIES=${all.size} ORACLES=${SparkEntry.oracleSql.size}")
  }
}
