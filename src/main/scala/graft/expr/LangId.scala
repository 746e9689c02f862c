package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass heuristic language ID over a (lowercased) token array.
  *
  * Same semantics as the composed-builtins form (distinct tokens ∩
  * per-language stopword profile, argmax, lexicographically-largest
  * language wins ties, `und` when all scores are 0) — but a single pass
  * over the tokens against static hash sets instead of an
  * array_distinct + one array_intersect (with its per-row set build)
  * per language.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lang_id requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.LangId$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  /** Profiles sorted by language code — scores index-aligned; on ties the
    * LAST (lexicographically largest) winning index is kept, matching
    * struct-greatest semantics of the builtin formulation.
    */
  val profiles: Seq[(String, Set[UTF8String])] =
    graft.ops.TextOps.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> words.map(UTF8String.fromString).toSet
    }
  private val langs = profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val sets = profiles.map(_._2).toArray
  private val und = UTF8String.fromString("und")

  def compute(arr: ArrayData): UTF8String = {
    val seen = new java.util.HashSet[UTF8String]()
    val scores = new Array[Int](sets.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t)) {
          var l = 0
          while (l < sets.length) {
            if (sets(l).contains(t)) scores(l) += 1
            l += 1
          }
        }
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < scores.length) {
      if (scores(l) > 0 && scores(l) >= bestScore) { best = l; bestScore = scores(l) }
      l += 1
    }
    if (best < 0) und else langs(best)
  }
}
