package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FEvent

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000L)

  private def run(batches: Seq[Seq[FEvent]],
                  delay: String = "0 seconds"): Map[Long, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FEvent]
    val sink = "sfunnel_sink_" + System.nanoTime()
    val q = StreamingFunnel.depths(mem.toDS(), 3, delay).toDF()
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val out = spark.table(sink).groupBy("ukey").agg(max("depth").as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.catalog.dropTempView(sink)
    out
  }

  test("watermark buffering repairs cross-batch disorder the automaton alone cannot") {
    // batch 1: user 1's CLICK (us=2s) and PURCHASE (us=3s) arrive FIRST —
    // below the 10s lateness horizon they buffer instead of being
    // misjudged. batch 2: the earlier VIEW (us=1s) arrives (wm = 3s−10s,
    // still admissible). Two far lids then push the watermark past
    // everything (two: the event-time timeout fires on STRICT wm>, so the
    // first lid alone leaves the last drain pending until a later batch)
    // and the buffer drains in (us, event_id) order: depth 3.
    val out = run(Seq(
      Seq(FEvent(1L, ts(2_000_000L), 2_000_000L, 2L, 1),
          FEvent(1L, ts(3_000_000L), 3_000_000L, 3L, 2)),
      Seq(FEvent(1L, ts(1_000_000L), 1_000_000L, 1L, 0)),
      Seq(FEvent(9000001L, ts(100_000_000L), 100_000_000L, 100L, -1)),
      Seq(FEvent(9000002L, ts(200_000_000L), 200_000_000L, 101L, -1))
    ), delay = "10 seconds")
    assert(out(1L) == 3, s"full funnel after in-order drain, got $out")
  }

  test("strict order still enforced after the drain: click before view stays depth 1") {
    val out = run(Seq(
      Seq(FEvent(2L, ts(1_000_000L), 1_000_000L, 1L, 1), // click first
          FEvent(2L, ts(2_000_000L), 2_000_000L, 2L, 0)), // then view
      Seq(FEvent(9L, ts(100_000_000L), 100_000_000L, 99L, -1))
    ))
    assert(out(2L) == 1, s"click preceding every view must not count, got $out")
  }

  test("same-timestamp events order by event_id inside a drain") {
    val out = run(Seq(
      Seq(FEvent(3L, ts(1_000_000L), 1_000_000L, 5L, 0),  // view eid 5
          FEvent(3L, ts(1_000_000L), 1_000_000L, 6L, 1),  // click eid 6: counts
          FEvent(4L, ts(1_000_000L), 1_000_000L, 8L, 0),  // view eid 8
          FEvent(4L, ts(1_000_000L), 1_000_000L, 7L, 1)), // click eid 7: too early
      Seq(FEvent(9L, ts(100_000_000L), 100_000_000L, 99L, -1)),
      Seq(FEvent(9L, ts(200_000_000L), 200_000_000L, 100L, -1))
    ))
    assert(out(3L) == 2 && out(4L) == 1, s"event_id tiebreak, got $out")
  }

  test("late rule pin: a row with event time exactly AT the watermark is DROPPED") {
    // q168's harness slices on ms-ALIGNED ranges because of this exact
    // behavior: with a 0s delay, a row arriving with ts == current
    // watermark is filtered as late (INCLUSIVE boundary) before the
    // stateful operator ever sees it. If a Spark upgrade relaxes this to
    // strict '<', this probe fails readably and the q168 comment should be
    // updated — the gate itself stays correct either way (ms-aligned
    // slices keep later batches strictly above the watermark).
    val out = run(Seq(
      Seq(FEvent(7L, ts(1_000_000L), 1_000_000L, 1L, 0)), // sets wm to 1s
      Seq(FEvent(8L, ts(1_000_000L), 1_000_000L, 2L, 0)), // ts == wm: dropped
      Seq(FEvent(9L, ts(100_000_000L), 100_000_000L, 99L, -1)),
      Seq(FEvent(9L, ts(200_000_000L), 200_000_000L, 100L, -1))
    ))
    assert(out(7L) == 1, s"on-time row must survive, got $out")
    assert(!out.contains(8L),
      s"ts == watermark row was ADMITTED — Spark's late-row boundary " +
        s"changed from inclusive to strict; got $out")
  }

  test("a quiet entity drains via timeout once the watermark passes its buffer") {
    val out = run(Seq(
      // user 5 buffers a full funnel, then never appears again
      Seq(FEvent(5L, ts(1_000_000L), 1_000_000L, 1L, 0),
          FEvent(5L, ts(2_000_000L), 2_000_000L, 2L, 1),
          FEvent(5L, ts(3_000_000L), 3_000_000L, 3L, 2)),
      // watermark advances on an unrelated key; user 5 must still emit 3
      Seq(FEvent(9L, ts(100_000_000L), 100_000_000L, 99L, -1)),
      Seq(FEvent(9L, ts(200_000_000L), 200_000_000L, 100L, -1))
    ))
    assert(out(5L) == 3, s"timeout-driven drain, got $out")
  }
}
