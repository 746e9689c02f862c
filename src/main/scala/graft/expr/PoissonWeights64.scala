package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 64 Poisson(1) bootstrap weights for one row in ONE kernel call
  * (SURVEY §2.11 policy: custom Catalyst `Expression` where built-ins
  * can't express the op efficiently).
  *
  * Draw definition — IDENTICAL to the composable form the DuckDB oracle
  * runs, draw for draw: for replicate block `blk` ∈ 0..7 the digest is
  * `md5(key || "|" || blk)` (key = the caller's `concat_ws("|", …)` row
  * key); the digest's eight 16-bit big-endian slices are the block's
  * eight uniform draws; each weight is the count of CDF thresholds
  * (floor(cdf·16⁴): 0x5e2d, 0xbc5a, 0xeb71, 0xfb23, 0xff10) at or below
  * the draw. Byte-wise `v ≥ t` on the raw digest equals the oracle's
  * lexicographic `substring(hex, 1+4i, 4) ≥ "…"` on the hex form —
  * lowercase-hex order IS unsigned numeric order.
  *
  * Why an expression and not 64 `substring`+`when` columns: the
  * composable form allocates a 4-char UTF8String slice and walks a
  * 5-branch string CASE per draw — measured 4.4 s of the 7.0 s
  * single-pass bootstrap at sf0.1. This kernel reads digest bytes with
  * zero allocation per draw (one md5 reuse + int compares), cutting the
  * weight derivation to noise while keeping the md5-defined distribution
  * bit-identical.
  */
case class PoissonWeights64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_weights64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poisson_weights64 requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PoissonWeights64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = graft.expr.PoissonWeights64$$.MODULE$$.compute($key);")

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights64 =
    copy(child = newChild)
}

object PoissonWeights64 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Compiled kernel, shared by eval and codegen: 8 digests, 64 weights. */
  def compute(key: UTF8String): ArrayData = {
    val md = md5.get()
    val kb = key.getBytes
    val out = new Array[Long](64)
    var blk = 0
    while (blk < 8) {
      md.reset()
      md.update(kb)
      md.update('|'.toByte)
      md.update(('0' + blk).toByte)
      val d = md.digest()
      var i = 0
      while (i < 8) {
        val v = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
        var w = 0L
        if (v >= 0x5e2d) w += 1
        if (v >= 0xbc5a) w += 1
        if (v >= 0xeb71) w += 1
        if (v >= 0xfb23) w += 1
        if (v >= 0xff10) w += 1
        out(blk * 8 + i) = w
        i += 1
      }
      blk += 1
    }
    new GenericArrayData(out)
  }
}
