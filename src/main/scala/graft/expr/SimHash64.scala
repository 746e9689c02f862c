package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass SimHash-64 over a token array (SURVEY §2.11 policy: custom
  * Catalyst `Expression` where built-ins can't express the op
  * efficiently — the higher-order-function formulation needs 64 separate
  * folds over the array, one per output bit; this computes all 64 bit
  * votes in ONE pass per token).
  *
  * Token hash = xxhash64(token, seed 42) — identical to Spark's builtin
  * `xxhash64` (XXH64 over the UTF8String bytes), so results match the
  * HOF formulation bit-for-bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.SimHash64$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Cross-engine-verifiable SimHash-64 sibling of [[SimHash64]]: the
  * per-token hash is the FIRST 64 BITS (big-endian) of the token's MD5
  * digest — exactly the first 16 hex chars of `md5(token)`, which any
  * engine with an md5() built-in (DuckDB included) can recompute
  * bit-for-bit, unlike xxhash64 whose seeding is engine-local. Same
  * single-pass 64-bit vote kernel; MD5 costs more cycles per token than
  * XXH64 but buys a fingerprint an external oracle can rebuild from
  * scratch. Use [[SimHash64]] when the fingerprint never leaves the
  * engine and raw throughput matters.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5 requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashMd5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.SimHashMd5$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Compiled single-pass kernel, shared by eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = md5.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 digest bytes big-endian: bit b of h is the bit an
        // oracle derives from hex char (16 - b/4) of md5's hex form
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SimHash64 {
  /** Compiled single-pass kernel, shared by eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
