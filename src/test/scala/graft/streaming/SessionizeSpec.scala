package graft.streaming

import graft.SparkSpec
import graft.Tables
import graft.streaming.Sessionize.{OpenSession, SessEvent}

class SessionizeSpec extends SparkSpec {

  test("advance: pure state transition closes sessions on gaps") {
    val gap = 100L
    val ev = Seq(
      SessEvent(1, 0, 1.0), SessEvent(1, 50, 2.0),   // session A
      SessEvent(1, 200, 3.0),                        // gap → closes A
      SessEvent(1, 250, 4.0))                        // continues B
    val (closed, open) = Sessionize.advance(None, ev, gap)
    assert(closed == Seq((1L, OpenSession(0, 50, 2, 3.0))))
    assert(open.contains(OpenSession(200, 250, 2, 7.0)))
    // resuming from open state merges instead of restarting
    val (c2, o2) = Sessionize.advance(open, Seq(SessEvent(1, 300, 1.0)), gap)
    assert(c2.isEmpty && o2.contains(OpenSession(200, 300, 3, 8.0)))
    // a late-but-within-gap event from a later batch extends bounds
    // backwards without shrinking `last` (timeout must stay at 300+gap)
    val (c3, o3) = Sessionize.advance(o2, Seq(SessEvent(1, 260, 1.0)), gap)
    assert(c3.isEmpty && o3.contains(OpenSession(200, 300, 4, 9.0)))
    // a late event before the session start extends `start` back
    val (c4, o4) = Sessionize.advance(o3, Seq(SessEvent(1, 150, 1.0)), gap)
    assert(c4.isEmpty && o4.contains(OpenSession(150, 300, 5, 10.0)))
  }

  test("streamed sessions match batch sessions (modulo final open sessions)") {
    val sf = "/root/testdata/sf0.001"
    val tmp = stagedEvents(sf)

    val streamed = Sessionize.streamingSessions(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batchAll = Sessionize.batchSessions(Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batchSet = batchAll.toSet
    // each user's chronologically-last session may still be open when the
    // stream drains (no later event/watermark to close it)
    val lastPerUser = batchAll.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    val batchClosed = batchSet -- lastPerUser

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchSet),
      s"streamed produced sessions batch doesn't have: ${streamed -- batchSet}")
    assert(batchClosed.subsetOf(streamed),
      s"batch-closed sessions missing from stream: ${(batchClosed -- streamed).take(3)}")
  }
}
