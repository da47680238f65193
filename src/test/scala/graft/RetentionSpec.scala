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

  test("streaming accumulate ≡ batch over the union; late slice moves a cohort earlier") {
    import graft.streaming.RetentionStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_ret_stream").toString
    val table = s"$tmp/uw"
    val all = Seq(
      (1L, ts("2024-01-08 10:00:00")), // u1 seen wk1 first in slice A...
      (1L, ts("2024-01-15 10:00:00")),
      (2L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-02 08:00:00")), // ...but slice C reveals u1's wk0 event
      (2L, ts("2024-01-08 09:00:00")),
      (3L, ts("2024-01-15 12:00:00"))
    )
    val slices = Seq(all.take(2), all.slice(2, 4), all.drop(4))
    slices.foreach { sl =>
      RetentionStream.accumulateBatch(table,
        RetentionStream.uwPartial(sl.toDF("user_id", "ts"), "user_id", "ts"))
    }
    val got = RetentionStream.matrix(spark, table)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = Retention.cohortRetention(all.toDF("user_id", "ts"), "user_id", "ts")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want, "accumulated matrix must equal the batch operator on the union")
    // u1's cohort is wk0 (revealed late), so wk1/wk2 activity sits at offsets 1/2
    assert(got(("2024-01-01", 1L)) === 2L) // u1 AND u2 active at offset 1
    // state stays the compacted distinct relation
    val state = spark.read.parquet(table)
    assert(state.count() === state.distinct().count())
    assert(state.count() === 6L) // 6 distinct (user, week) pairs
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
