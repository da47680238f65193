package graft

import java.sql.Timestamp

import graft.operators.Retention

/** Cohort retention: hand-computed matrix, within-week dedup, Monday
  * week anchoring, null exclusion.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention matrix: hand-computed cohorts and offsets") {
    // 2024-01-01 is a Monday; weeks are 01-01, 01-08, 01-15
    val events = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00"))), // u1 wk0
      (Some(1L), Some(ts("2024-01-03 09:00:00"))), // u1 wk0 again (Wed — same week)
      (Some(1L), Some(ts("2024-01-08 11:00:00"))), // u1 wk1
      (Some(1L), Some(ts("2024-01-21 23:59:59"))), // u1 wk2 (Sunday — still wk of 01-15)
      (Some(2L), Some(ts("2024-01-02 08:00:00"))), // u2 wk0 only
      (Some(3L), Some(ts("2024-01-09 12:00:00"))), // u3 cohort wk1
      (Some(3L), Some(ts("2024-01-15 12:00:00"))), // u3 wk2 -> offset 1
      (None, Some(ts("2024-01-01 00:00:00"))),     // null user dropped
      (Some(4L), None)                              // null ts dropped
    ).toDF("user_id", "ts")
    val got = Retention.cohortRetention(events, "user_id", "ts")
      .as[(String, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    val want = Map(
      ("2024-01-01", 0L) -> 2L, // u1, u2
      ("2024-01-01", 1L) -> 1L, // u1
      ("2024-01-01", 2L) -> 1L, // u1
      ("2024-01-08", 0L) -> 1L, // u3
      ("2024-01-08", 1L) -> 1L) // u3
    assert(got === want)
  }

  test("empty input yields an empty matrix, not a failure") {
    val empty = Seq.empty[(Option[Long], Option[Timestamp])].toDF("user_id", "ts")
    assert(Retention.cohortRetention(empty, "user_id", "ts").count() === 0L)
  }
}
