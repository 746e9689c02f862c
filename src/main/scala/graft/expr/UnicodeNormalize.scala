package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression —
  * the front door of text hygiene for a multilingual training corpus:
  * visually-identical strings with different codepoint sequences
  * ("e" + U+0301 vs "é") defeat exact dedup, shingle hashing, and
  * tokenizer vocabularies unless every document is normalized ONCE at
  * ingest. Spark ships no normalizer builtin; a UDF would fall out of
  * whole-stage codegen, so this is the custom-Expression path
  * (SURVEY §4.3 preference order).
  *
  * The kernel short-circuits through `Normalizer.isNormalized` — for
  * the dominant already-normalized (e.g. pure-ASCII) case the cost is
  * one quick-check scan and ZERO allocation, which is what makes a
  * corpus-wide pass affordable at 100 TB.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string, got ${child.dataType}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (one of ${UnicodeNormalize.Forms.keys.mkString("/")})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.expr.UnicodeNormalize$$.MODULE$$.compute($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  def compute(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
