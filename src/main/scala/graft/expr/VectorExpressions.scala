package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass vector kernels (SURVEY §4.3's "optional custom Expression"
  * path, promoted to default because the higher-order-function
  * formulation is interpreted per lambda element — a compiled loop over
  * the ArrayData is ~10× cheaper per pair and matters on O(n²) near-dup
  * scoring).
  *
  * Numeric contract: elements are cast to double BEFORE multiplying and
  * accumulated left-to-right — bit-identical to the `zip_with` +
  * `aggregate` fold AND to the DuckDB oracle's list fold, so swapping
  * implementations cannot move any oracle-checked value.
  *
  * Degenerate inputs are NULL, never a fabricated number: mismatched
  * array lengths → null (the zip_with fold null-poisons the same way —
  * a truncated embedding row must not yield a plausible partial dot),
  * and a zero-norm side in cosine → null (DuckDB's division semantics;
  * the IEEE NaN a raw double division produces would sort ABOVE every
  * real score in a descending top-k).
  *
  * Codegen: each expression emits one static call into the compiled
  * kernel below, keeping the enclosing projection inside whole-stage
  * codegen (a CodegenFallback would collapse the whole span to the
  * interpreted path).
  */
trait VectorBinaryBase extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // degenerate inputs yield null

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float|double> args, got $other")
    }

  protected final def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected final def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

object VectorKernels {
  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Boxed return: null marks a degenerate input (length mismatch). */
  def dot(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): java.lang.Double = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(l, lf, i) * elem(r, rf, i); i += 1 }
    acc
  }

  /** Boxed return: null on length mismatch or a zero-norm side. */
  def cosine(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): java.lang.Double = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(l, lf, i); val y = elem(r, rf, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Left-to-right double dot product of two numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryBase {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dotBoxed")
      s"""java.lang.Double $tmp = graft.expr.VectorKernels$$.MODULE$$.dot($l, $r, $leftIsFloat, $rightIsFloat);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Cosine similarity — dot and both norms in ONE pass over the arrays
  * (the composed-builtins form needs three).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryBase {
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("cosBoxed")
      s"""java.lang.Double $tmp = graft.expr.VectorKernels$$.MODULE$$.cosine($l, $r, $leftIsFloat, $rightIsFloat);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}
