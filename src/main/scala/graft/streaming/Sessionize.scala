package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User-session assignment over an event stream (ts, user_id, ...) with a
  * gap timeout — the canonical stateful-streaming operator, in both forms:
  *
  *  - [[assignSessions]]: batch/SQL form — a gap marker via `lag` + a running
  *    `sum` over the user window. Two logical window passes, ONE shuffle
  *    (both windows share the user_id partitioning, so Catalyst plans a
  *    single Exchange + sort).
  *  - [[streamingSessions]]: incremental form via
  *    `flatMapGroupsWithState` with event-time timeout — state per user is
  *    O(1) (current session bounds), emitted on gap expiry.
  */
object Sessionize {

  /** Batch sessionization: session breaks where the gap to the previous
    * event of the same user exceeds `gapMinutes`; session_id numbers a
    * user's sessions from 1 in time order.
    */
  def assignSessions(events: DataFrame, gapMinutes: Int = 30,
                     userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col("event_id"))
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(byUser).cast("long")
    events
      .withColumn("is_break",
        when(gap.isNull || gap > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_break")).over(byUser))
      .drop("is_break")
  }

  /** Per-session rollup of the batch assignment (oracle-friendly shape). */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    assignSessions(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Streaming sessionization: emits one row per CLOSED session (closed by a
    * later event beyond the gap, or by event-time timeout via watermark).
    */
  def streamingSessions(events: Dataset[Event],
                        gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
