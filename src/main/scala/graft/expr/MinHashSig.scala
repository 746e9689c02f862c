package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass MinHash signature over a shingle array (SURVEY §2.11
  * policy: custom `Expression` where the built-in formulation is
  * asymptotically wasteful).
  *
  * The HOF form — `transform(sequence(0,k-1), s => array_min(transform(
  * sh, x => xxhash64(x, s))))` — re-hashes every shingle's BYTES once per
  * seed: k full byte-hashes per element. Spark's `xxhash64(x, s)` chains
  * `hashInt(s, hashUTF8String(x, 42))`, so the byte hash is
  * seed-independent: this kernel hashes each element's bytes ONCE and
  * folds the k cheap int-mixes, producing bit-identical signatures
  * (parity-asserted in TextVectorSpec) at 1/k of the byte-hashing work.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.MinHashSig$$.MODULE$$.compute($arr, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Compiled kernel, shared by eval and codegen. Null elements hash as
    * Spark's `xxhash64(null, s)` does (null skipped → base stays at the
    * 42 seed); an empty input array yields an all-null signature, like
    * `array_min` over an empty array.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, base)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
