package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build: turn an append-only change
  * log into versioned dimension rows with validity intervals —
  * (key, attrs, valid_from, valid_to, version, is_current). Consecutive
  * log entries whose tracked attributes are unchanged collapse into one
  * version; `valid_to` of a version is the `valid_from` of the next
  * (half-open intervals), and the latest version per key is open-ended
  * (`valid_to` null, `is_current` true).
  *
  * `orderCols` must be a TOTAL order per key (pass a tie-break — e.g.
  * the log's monotone surrogate id — after the event time): with ties
  * left unbroken, which duplicate wins is partitioning-dependent and
  * the output nondeterministic.
  *
  * Scale shape: two window passes over the SAME (key, order) window —
  * one hash shuffle on the key, both sorts reuse it (locked in
  * PlanSpec). No joins, no driver state; 100 TB of history keyed by a
  * reasonable dimension key partitions evenly.
  */
object Scd {

  def scd2(changes: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "scd2: keyCols, orderCols and attrCols must all be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val attrs: Column = struct(attrCols.map(col): _*)
    val ts = col(orderCols.head)
    changes
      // version boundary = first row per key, or tracked attrs changed
      // (null-safe struct compare: <=> is false against the first-row
      // null lag, so the head row always opens a version)
      .withColumn("__chg", !(lag(attrs, 1).over(w) <=> attrs))
      .filter(col("__chg"))
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          col("is_current")): _*)
  }
}
