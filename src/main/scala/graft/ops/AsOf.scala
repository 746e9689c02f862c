package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the latest right row at or before
  * its timestamp (or, forward form, the earliest at or after), per key".
  * Spark has no built-in relational form; the classic scalable
  * composition is union + ordered window (SURVEY §2.3 notes the
  * reference needs no as-of join — this is part of the LLM-pipeline
  * scope extension, e.g. joining events to the most recent model-state
  * snapshot).
  *
  * Plan shape: ONE shuffle on the key and one sort — the pair join a
  * naive formulation materializes (left × all-candidate-right) never
  * exists. At 100 TB this is the difference between a keyed sort-merge
  * pass and an O(n·m) blowup.
  */
object AsOf {

  /** Shared union+window core. `forward=false` scans time ascending
    * (latest at-or-before wins, right ties → max tieBreak via asc order
    * + last()); `forward=true` scans descending (earliest at-or-after
    * wins, right ties → min tieBreak via desc order + last()). In both,
    * the left sentinel tie value sorts the left row AFTER its equal-time
    * right rows so the match is inclusive.
    */
  private def asofCore(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTimeUs: Column, rightTimeUs: Column,
                       rightPayload: Seq[String], rightTieBreak: String,
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", leftTimeUs)
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(if (forward) Long.MinValue else Long.MaxValue))
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .select(col(rightKey).as("__k"), rightTimeUs.as("__t"),
        lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
        payload.as("__payload"))
    val rAligned = leftCols.foldRight(r) { (c, acc) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val (tOrd, tieOrd) =
      if (forward) (col("__t").desc, col("__tie").desc)
      else (col("__t").asc, col("__tie").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(tOrd, col("__side").asc, tieOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(rAligned.columns.toIndexedSeq.map(col): _*).unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col("__match"): _*)
  }

  /** @param leftTimeUs / rightTimeUs  epoch-µs columns (integer — see
    *   Sessionize on cross-engine timestamp determinism)
    * @param rightPayload  right columns carried to the matched output;
    *   they arrive from the SAME matched right row (packed as a struct)
    * @param rightTieBreak right column making "latest" total-ordered when
    *   right timestamps collide
    */
  def joinLastBefore(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTimeUs: Column, rightTimeUs: Column,
                     rightPayload: Seq[String],
                     rightTieBreak: String): DataFrame =
    asofCore(left, right, leftKey, rightKey, leftTimeUs, rightTimeUs,
      rightPayload, rightTieBreak, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row at or after
    * its timestamp, per key. Right ties resolve to the smallest
    * `rightTieBreak`.
    */
  def joinFirstAfter(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTimeUs: Column, rightTimeUs: Column,
                     rightPayload: Seq[String],
                     rightTieBreak: String): DataFrame =
    asofCore(left, right, leftKey, rightKey, leftTimeUs, rightTimeUs,
      rightPayload, rightTieBreak, forward = true)
}
