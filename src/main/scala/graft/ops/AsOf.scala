package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the latest right row at or before
  * its timestamp, per key". Spark has no built-in relational form; the
  * classic scalable composition is union + ordered window (SURVEY §2.3
  * notes the reference needs no as-of join — this is part of the
  * LLM-pipeline scope extension, e.g. joining events to the most recent
  * model-state snapshot).
  *
  * Plan shape: ONE shuffle on the key and one sort — the pair join a
  * naive formulation materializes (left × all-earlier-right) never
  * exists. At 100 TB this is the difference between a keyed sort-merge
  * pass and an O(n·m) blowup.
  */
object AsOf {

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
                     rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", leftTimeUs)
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .select(col(rightKey).as("__k"), rightTimeUs.as("__t"),
        lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
        payload.as("__payload"))
    val rAligned = leftCols.foldRight(r) { (c, acc) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // sort: time asc, right-before-left at equal time (inclusive <=),
    // right ties resolved by __tie so "latest" is deterministic
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(rAligned.columns.toIndexedSeq.map(col): _*).unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col("__match"): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row at or after
    * its timestamp, per key — same union+window shape scanned in
    * descending time order (one keyed shuffle, one sort, no pair
    * blowup). Right ties resolve to the smallest `rightTieBreak`.
    */
  def joinFirstAfter(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTimeUs: Column, rightTimeUs: Column,
                     rightPayload: Seq[String],
                     rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", leftTimeUs)
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MinValue))
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .select(col(rightKey).as("__k"), rightTimeUs.as("__t"),
        lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
        payload.as("__payload"))
    val rAligned = leftCols.foldRight(r) { (c, acc) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // descending scan: the frame above a left row holds all right rows
    // with __t >= left time (inclusive — right sorts before left at equal
    // time); last() picks the nearest, __tie DESC makes equal-time rights
    // resolve to the smallest tie-break
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(rAligned.columns.toIndexedSeq.map(col): _*).unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col("__match"): _*)
  }
}
