package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: two sessions (45-min gap between event 2 and 3)
    (1L, 1L, ts("2025-01-01 10:00:00"), "click", 1.0),
    (2L, 1L, ts("2025-01-01 10:10:00"), "view", 2.0),
    (3L, 1L, ts("2025-01-01 10:55:00"), "click", 3.0),
    // user 2: one session, events exactly at the 30-min boundary (no break)
    (4L, 2L, ts("2025-01-01 09:00:00"), "click", 1.0),
    (5L, 2L, ts("2025-01-01 09:30:00"), "view", 1.0)
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("batch sessionization: gap breaks, boundary inclusive, ids from 1") {
    val got = Sessionize.sessionStats(events, 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 2L))
  }

  test("native session_window MERGES at the exact gap boundary (break is strictly > gap)") {
    // THE PIN BEHIND q108's ORACLE. An earlier draft assumed the native
    // [start, start+gap) window end was exclusive (split at diff == gap);
    // this probe refuted it: user 2's events exactly 30 min apart land in
    // ONE native session, so session_window's break rule is `diff > gap`
    // — identical to the lag-based rule — and one micro past the
    // boundary must split.
    val native = events.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == Map(1L -> 2L, 2L -> 1L), s"native sessions: $native")
    // one microsecond past the gap DOES split
    val justPast = Seq(
      (1L, 9L, Timestamp.valueOf("2025-01-01 09:00:00"), "click", 1.0),
      (2L, 9L, new Timestamp(Timestamp.valueOf("2025-01-01 09:30:00").getTime) {
        setNanos(1000) // 09:30:00.000001
      }, "view", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val split = justPast.groupBy(session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1))).count()
    assert(split == 2L, "one microsecond past the gap must break the session")
    // and the native session end extends gap past the LAST event
    val ends = events.where(col("user_id") === 2L)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)))
      .select(date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect().sorted
    assert(ends.toSeq == Seq("2025-01-01 10:00:00"))
  }

  test("batch plan: both window passes share ONE shuffle") {
    val plan = Sessionize.assignSessions(events, 30).queryExecution.executedPlan
    val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected a single exchange, plan:\n$plan")
  }

  test("streaming sessionization closes sessions on gap and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.streamingSessions(mem.toDS(), 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    mem.addData(
      Event(1L, ts("2025-01-01 10:00:00"), "click", 1.0),
      Event(1L, ts("2025-01-01 10:10:00"), "view", 2.0))
    q.processAllAvailable()
    // next event is past the gap -> first session closes
    mem.addData(Event(1L, ts("2025-01-01 10:55:00"), "click", 3.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[Sessionize.Session].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2)
    assert(closed.head.session_start == ts("2025-01-01 10:00:00"))
    assert(closed.head.session_end == ts("2025-01-01 10:10:00"))
  }
}
