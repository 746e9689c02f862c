package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query into a serialized count-min sketch (the binary emitted by
  * Spark's `count_min_sketch(col, eps, confidence, seed)` aggregate):
  * `cms_estimate(sketch, item)` → the sketch's frequency estimate for
  * `item`. Completes the mergeable-sketch read path — the aggregate
  * builds/merges map-side, this probes the one merged row.
  *
  * Deserialization is cached per (task, sketch-reference): the sketch
  * column is a broadcast 1-row frame in every intended plan, so each
  * task deserializes once and probes many items. CodegenFallback is
  * deliberate — the probe side is a handful of rows per query (the
  * sketch row is the data path; probing is presentation), so interpreted
  * eval costs nothing while keeping the expression 30 lines.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, string|bigint), got ($l, $r)")
    }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    item match {
      // estimateCount hashes strings over their UTF-8 bytes — feed it the
      // exact bytes the aggregate hashed, not a JVM String re-encode
      case s: UTF8String => lastSketch.estimateCount(s.getBytes)
      case other => lastSketch.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
