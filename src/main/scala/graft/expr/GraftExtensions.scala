package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom Catalyst expressions
  * (SURVEY §2.11): `simhash64`, `simhash_md5`, `minhash_sig`, `dot_product`,
  * `cosine_similarity` become callable from `spark.sql(...)` text, not
  * just the Column API.
  *
  * Cluster wiring (the standard extension point):
  * {{{
  *   spark.sql.extensions=graft.expr.GraftExtensions
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions()(_))`.
  * For an already-built session, [[GraftExtensions.register]] installs
  * the same functions imperatively (used by tests and Verify, where the
  * session comes from the driver harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => GraftRules.RoundRoundFold)
    // builder-time only (NOT in the imperative register()): injecting an
    // optimizer rule into a session mid-flight would silently change the
    // plans of sibling queries already running on it
    ext.injectOptimizerRule(_ => GraftRules.WindowTopKToAggregate)
  }
}

object GraftExtensions {

  private def info(className: String, name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(className, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("graft.expr.SimHash64", "simhash64",
        "simhash64(array<string>) -> bigint"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("simhash_md5"),
      info("graft.expr.SimHashMd5", "simhash_md5",
        "simhash_md5(array<string>) -> bigint"),
      (args: Seq[Expression]) => SimHashMd5(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("graft.expr.MinHashSig", "minhash_sig",
        "minhash_sig(array<string>, k) -> array<bigint>"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case e if e.foldable => e.eval()
          case _ => null
        }
        require(k.isInstanceOf[Number],
          "minhash_sig: k must be a non-null integer literal")
        MinHashSig(args.head, k.asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier("dot_product"),
      info("graft.expr.DotProduct", "dot_product",
        "dot_product(array<num>, array<num>) -> double"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    (FunctionIdentifier("cosine_similarity"),
      info("graft.expr.CosineSimilarity", "cosine_similarity",
        "cosine_similarity(array<num>, array<num>) -> double"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    (FunctionIdentifier("freq_items_sketch"),
      info("graft.expr.FreqItemsAgg", "freq_items_sketch",
        "freq_items_sketch(col, capacity) -> map<string,bigint> (Misra-Gries)"),
      (args: Seq[Expression]) => {
        val cap = args(1) match {
          case e if e.foldable => e.eval()
          case _ => null
        }
        require(cap.isInstanceOf[Number],
          "freq_items_sketch: capacity must be a non-null integer literal")
        // the analyzer wraps a bare AggregateFunction in Complete mode
        FreqItemsAgg(args.head, cap.asInstanceOf[Number].intValue())
      }))

  /** Imperative registration into an existing session (same functions and
    * optimizer rules the extension injects at build time —
    * `experimental.extraOptimizations` is the public post-build hook for
    * rules).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(GraftRules.RoundRoundFold))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftRules.RoundRoundFold
  }
}
