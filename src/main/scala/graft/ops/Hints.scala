package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated join-side hints (r12 verdict item 2).
  *
  * A hard `broadcast()` on a DATA-DEPENDENT frame overrides AQE's size
  * logic unconditionally: at 100× the data, a frame that outgrew the
  * broadcast bound (8 GB hard limit, driver/executor memory long before
  * that) fails the job instead of degrading to a shuffle join. Every
  * comment of the form "at 100 TB this falls back to a shuffle join"
  * must be CODE, not prose — this helper is that code.
  *
  * Contract: the frame is materialized ONCE (`localCheckpoint`), its
  * exact row count taken from the materialized blocks (cheap — no
  * recompute), and the result is either `broadcast(frame)` (small
  * regime) or `frame.hint("shuffle_hash")` (large regime: build a hash
  * map per partition, no sort — the right degradation for the
  * semi/anti-join shapes these frames feed). Materializing first also
  * means multi-consumer callers (Apriori uses F2 twice) stop paying the
  * aggregation per consumer.
  *
  * The threshold is a ROW-COUNT proxy for build-side bytes — callers
  * pick `maxRows` for their row shape (a packed-long key row is ~16
  * bytes in a broadcast hash relation; the 2M default keeps the build
  * side well under Spark's 8 GB cap with wide margin). Tests force both
  * regimes through the `graft.broadcast.maxRows` session conf, which
  * overrides the caller's value when set.
  */
object Hints {

  /** Session-conf override for [[sizeGatedBroadcast]]'s threshold —
    * plan tests pin it to force either regime deterministically. */
  val MaxRowsConfKey = "graft.broadcast.maxRows"

  val DefaultMaxRows = 2000000L

  /** The decision record of one gate call — exposed so audits and plan
    * tests can assert WHY a plan shape was chosen, not just that it
    * was. */
  final case class GateDecision(rows: Long, threshold: Long) {
    def broadcasted: Boolean = rows <= threshold
  }

  /** [[sizeGatedBroadcast]] plus its decision record. */
  def sizeGatedBroadcastWithDecision(df: DataFrame,
                                     maxRows: Long = DefaultMaxRows)
      : (DataFrame, GateDecision) = {
    val threshold = df.sparkSession.conf.getOption(MaxRowsConfKey)
      .map(_.toLong).getOrElse(maxRows)
    // eager local checkpoint: one materialization serves the row-count
    // probe AND every downstream consumer; the lineage truncation also
    // keeps a reused frame (Apriori's F2 feeds two semi-joins) from
    // re-running its aggregation per consumer
    val snap = df.localCheckpoint()
    val n = snap.count()
    val out = if (n <= threshold) broadcast(snap)
              else snap.hint("shuffle_hash")
    (out, GateDecision(n, threshold))
  }

  /** Broadcast `df` only when its exact materialized row count is within
    * `maxRows`; past it, degrade to a SHUFFLE_HASH hint instead of an
    * OOM'd build. See the object doc for the cost model.
    */
  def sizeGatedBroadcast(df: DataFrame,
                         maxRows: Long = DefaultMaxRows): DataFrame =
    sizeGatedBroadcastWithDecision(df, maxRows)._1
}
