package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Analytics, Augment, Behavior, Corpus, Curation, Evaluation, Extended, Frontier, Inference, Learners, Mining, Nonparam, Physical, Registry, Spectral, Stats, Structure, Temporal}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q_dedup_latest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries ++ Extended.queries ++ Corpus.queries ++
      Analytics.queries ++ Mining.queries ++ Curation.queries ++
      Frontier.queries ++ Spectral.queries ++ Stats.queries ++ Structure.queries ++ Evaluation.queries ++ Inference.queries ++ Temporal.queries ++ Learners.queries ++ Physical.queries ++ Behavior.queries ++ Augment.queries ++ Nonparam.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.oracleSql ++ Extended.oracleSql ++ Corpus.oracleSql ++
      Analytics.oracleSql ++ Mining.oracleSql ++ Curation.oracleSql ++
      Frontier.oracleSql ++ Spectral.oracleSql ++ Stats.oracleSql ++ Structure.oracleSql ++ Evaluation.oracleSql ++ Inference.oracleSql ++ Temporal.oracleSql ++ Learners.oracleSql ++ Physical.oracleSql ++ Behavior.oracleSql ++ Augment.oracleSql ++ Nonparam.oracleSql
}
