package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass vector kernels (SURVEY §4.3's "optional custom Expression"
  * path, promoted to default because the higher-order-function
  * formulation is interpreted per lambda element — a native loop over the
  * ArrayData is ~10× cheaper per pair and matters on O(n²) near-dup
  * scoring).
  *
  * Numeric contract: elements are cast to double BEFORE multiplying and
  * accumulated left-to-right — bit-identical to the `zip_with` +
  * `aggregate` fold AND to the DuckDB oracle's list fold, so swapping
  * implementations cannot move any oracle-checked value.
  */
trait VectorBinaryBase extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float|double> args, got $other")
    }

  @inline protected final def elem(a: ArrayData, t: DataType, i: Int): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }

  protected final def leftType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  protected final def rightType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
}

/** Left-to-right double dot product of two numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryBase {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = math.min(a.numElements(), b.numElements())
    val (lt, rt) = (leftType, rightType)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, lt, i) * elem(b, rt, i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Cosine similarity — dot and both norms in ONE pass over the arrays
  * (the composed-builtins form needs three).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryBase {
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = math.min(a.numElements(), b.numElements())
    val (lt, rt) = (leftType, rightType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, lt, i); val y = elem(b, rt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}
