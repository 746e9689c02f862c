package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ntile (SURVEY §2.9): exact `ntile(t) OVER (ORDER BY ...)`
  * semantics WITHOUT the single-partition total sort Spark plans for an
  * unpartitioned window (the classic scale-killer — the whole table lands
  * in one task).
  *
  * Strategy (two metadata passes + one partitioned pass):
  *   1. one-row agg: min/max of the primary order column + total count;
  *   2. bucket rows by `width_bucket(rangeCol, min, max, B)` — a PURE,
  *      order-aligned function of the row (equal values share a bucket, so
  *      buckets never split ties) — and collect per-bucket counts
  *      (≤ B rows to the driver: licensed tiny-metadata collect);
  *   3. map-side: global 0-based rank = broadcast prefix-offset(bucket)
  *      + row_number() over a window PARTITIONED by bucket, then the exact
  *      ntile formula on the rank.
  *
  * Because bucketing is a pure row function (not RangePartitioner
  * sampling), passes 2 and 3 agree without caching — no persist, no
  * job-to-job nondeterminism. The only full-data shuffle is the per-bucket
  * window, B-way parallel. Rank arithmetic goes through a double floor —
  * exact below 2^53 rows, far beyond any real table.
  *
  * Caveat (documented, not hidden): uniform-width buckets inherit the
  * value distribution of `rangeCol` — a pathologically skewed column
  * concentrates rows in few buckets (parallelism loss, not a correctness
  * loss). Raise `buckets` or pre-transform the column for such data.
  * If min == max the whole input degenerates to one bucket (equivalent to
  * the global window this replaces).
  */
object Tiling {

  /** Global 0-based rank over a total order, distributed — the scale-safe
    * replacement for `row_number() OVER (ORDER BY ...)` (which Spark
    * plans as an Exchange SinglePartition + one-task sort). Returns the
    * input plus `out` (LongType rank, 0-based) and the total row count.
    *
    * @param rangeCol  first column of the order — numeric; used for
    *                  bucketing (must be `orderCols.head` semantically).
    *                  NULLs bucket first, matching Spark's
    *                  asc_nulls_first window ordering.
    * @param orderCols total order (include a unique tie-break key)
    */
  def withGlobalRank(
      df: DataFrame,
      rangeCol: Column,
      orderCols: Seq[Column],
      out: String,
      buckets: Int = 64): (DataFrame, Long) = {
    // stats over FINITE values only: one NaN poisons max() (NaN compares
    // largest) and one ±Inf bound makes width_bucket return NULL for
    // every row — either way bucketing collapses. With finite bounds,
    // -Inf naturally falls in bucket 0 (before mn) and +Inf in the top
    // bucket (after mx); NaN gets its own trailing bucket below,
    // mirroring how Spark ordering sorts NaN last.
    val d = rangeCol.cast("double")
    val rangeFinite = when(
      isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity,
      lit(null).cast("double")).otherwise(d)
    val Array(stats) =
      df.agg(min(rangeFinite).as("mn"), max(rangeFinite).as("mx"),
             count(lit(1)).as("n"))
        .collect()
    val total = stats.getLong(2)
    if (total == 0L) return (df.withColumn(out, lit(null).cast("long")), 0L)
    // all-null/all-NaN range column: min/max are null — finite rows
    // can't exist, the null/NaN buckets below cover everything
    val allNull = stats.isNullAt(0)
    val (mn, mx) =
      if (allNull) (0.0, 0.0) else (stats.getDouble(0), stats.getDouble(1))

    // width_bucket yields 0 for v < mn (incl. -Inf), 1..B in range, and
    // B+1 for v ≥ mx (incl. +Inf) — fold B+1 into B (within-bucket order
    // still separates mx from +Inf). Degenerate range (mn == mx) →
    // single bucket. NULL sorts first in Spark (asc_nulls_first default)
    // → bucket 0 (shared with -Inf; within-bucket order separates them),
    // NaN sorts LAST (after +Inf) → its own trailing bucket.
    val finiteBucket: Column =
      if (mn == mx) lit(1)
      else least(width_bucket(d, lit(mn), lit(mx), lit(buckets)), lit(buckets.toLong))
    val bucket: Column = when(rangeCol.isNull, lit(0))
      .when(isnan(d), lit(buckets + 1))
      .otherwise(finiteBucket)

    // Per-bucket counts → prefix offsets (tiny driver collect, ≤ B rows).
    val counts = df.groupBy(bucket.as("__b")).count().collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)) // bucket -> rows before it
    val offsetMap = map(offsets.flatMap { case (b, off) => Seq(lit(b), lit(off)) }: _*)

    val w = Window.partitionBy(col("__graft_b")).orderBy(orderCols: _*)
    val rank0 = element_at(offsetMap, col("__graft_b")) +
      row_number().over(w).cast("long") - lit(1L)

    val ranked = df.withColumn("__graft_b", bucket.cast("long"))
      .withColumn(out, rank0)
      .drop("__graft_b")
    (ranked, total)
  }

  /** Exact interpolated percentiles WITHOUT a global sort or a
    * driver-side value map — the 100 TB path for exact quantiles.
    * Spark's `percentile` aggregate buffers per-value counts (memory ∝
    * value cardinality); a global sort is a single-task bottleneck. Here:
    * rank the values with [[withGlobalRank]] (ties need no tie-break —
    * the value AT a rank is unique even when rank assignment among equal
    * values isn't), filter to the ≤ 2·|ps| boundary ranks (map-side,
    * pruned scan of the ranked set), and interpolate driver-side.
    * Returns one row with a DoubleType column per requested percentile,
    * matching `percentile()`/DuckDB `quantile_cont` linear interpolation.
    */
  def exactPercentiles(
      df: DataFrame,
      valueCol: Column,
      ps: Seq[(String, Double)],
      buckets: Int = 64): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 })
    val spark = df.sparkSession
    // percentile()/quantile_cont ignore NULLs (and NaN has no place on a
    // quantile axis) — drop both before ranking
    val (ranked, n) =
      withGlobalRank(
        df.select(valueCol.cast("double").as("__v"))
          .filter(col("__v").isNotNull && !isnan(col("__v"))),
        col("__v"), Seq(col("__v")), "__rn", buckets)
    require(n > 0, "exactPercentiles on empty (or all-null) input")
    val targets = ps.map { case (name, p) =>
      val h = p * (n - 1)
      (name, h, math.floor(h).toLong, math.ceil(h).toLong)
    }
    val need = targets.flatMap(t => Seq(t._3, t._4)).distinct
    val at = ranked.filter(col("__rn").isin(need: _*))
      .collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
    val row = targets.map { case (name, h, lo, hi) =>
      // lo == hi must short-circuit: interpolating at an infinite value
      // would compute Inf - Inf = NaN where percentile()/quantile_cont
      // return the value itself
      val v = if (lo == hi) at(lo) else at(lo) + (h - lo) * (at(hi) - at(lo))
      (name, v)
    }
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(row.map(_._2))),
      org.apache.spark.sql.types.StructType(row.map { case (name, _) =>
        org.apache.spark.sql.types.StructField(name,
          org.apache.spark.sql.types.DoubleType, nullable = false)
      }))
  }

  /** Exact `ntile(t) OVER (ORDER BY ...)` on top of [[withGlobalRank]]:
    * first (total % tiles) tiles get one extra row, assigned map-side
    * from the rank.
    */
  def ntileDistributed(
      df: DataFrame,
      tiles: Int,
      rangeCol: Column,
      orderCols: Seq[Column],
      out: String,
      buckets: Int = 64): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val (ranked, total) =
      withGlobalRank(df, rangeCol, orderCols, "__graft_rank", buckets)
    if (total == 0L)
      return ranked.withColumn(out, lit(null).cast("int")).drop("__graft_rank")
    val rank0 = col("__graft_rank")
    val base = total / tiles
    val rem = total % tiles
    val tile: Column =
      if (base == 0L) (rank0 + lit(1L)).cast("int") // fewer rows than tiles
      else {
        val bigSpan = rem * (base + 1)
        when(rank0 < lit(bigSpan), floor(rank0 / lit(base + 1)) + lit(1L))
          .otherwise(lit(rem) + floor((rank0 - lit(bigSpan)) / lit(base)) + lit(1L))
          .cast("int")
      }
    ranked.withColumn(out, tile).drop("__graft_rank")
  }
}
