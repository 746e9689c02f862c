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

  /** Validate-and-extract for SQL builders that need a literal integral
    * parameter (k, capacity): a wrong arity or a non-integral/non-foldable
    * argument must surface as a descriptive analysis-time error, not a raw
    * IndexOutOfBoundsException or a silently-truncated 3.9 → 3.
    */
  private def literalInt(fn: String, param: String, args: Seq[Expression],
                         arity: Int, idx: Int): Int = {
    // IllegalArgumentException from a function builder surfaces at
    // analysis time with the message intact (no matching registered
    // error class exists for a plain-text AnalysisException here)
    require(args.length == arity,
      s"$fn expects $arity arguments, got ${args.length}")
    val e = args(idx)
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.LongType
           | org.apache.spark.sql.types.ShortType
           | org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    val v = if (ok) e.eval() else null
    require(v != null,
      s"$fn: $param must be a non-null integer literal, got ${e.sql}")
    val long = v.asInstanceOf[Number].longValue()
    require(long >= 1 && long <= Int.MaxValue,
      s"$fn: $param must be in [1, ${Int.MaxValue}], got $long")
    long.toInt
  }

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
      (args: Seq[Expression]) =>
        MinHashSig(args.head, literalInt("minhash_sig", "k", args, 2, 1))),
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
      (args: Seq[Expression]) =>
        // the analyzer wraps a bare AggregateFunction in Complete mode
        FreqItemsAgg(args.head,
          literalInt("freq_items_sketch", "capacity", args, 2, 1))),
    (FunctionIdentifier("cms_estimate"),
      info("graft.expr.CmsEstimate", "cms_estimate",
        "cms_estimate(sketch binary, item string|bigint) -> bigint"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cms_estimate expects 2 arguments, got ${args.length}")
        CmsEstimate(args.head, args(1))
      }))

  /** Imperative registration into an existing session: the same FUNCTIONS
    * the extension injects at build time, plus the RoundRoundFold peephole
    * via `experimental.extraOptimizations` (the public post-build hook for
    * rules). [[GraftRules.WindowTopKToAggregate]] is deliberately NOT
    * installed here — injecting a plan-rewriting rule into a session
    * mid-flight would silently change the plans of queries already running
    * on it; it is builder-time only (and gated by
    * `spark.graft.windowTopKRewrite.enabled` even then).
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
