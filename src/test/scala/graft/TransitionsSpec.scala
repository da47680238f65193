package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Transitions

/** Markov transition matrix: hand-computed counts/probabilities, pinned
  * tie order, null exclusion, per-state probability closure.
  */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transition counts and probabilities from first principles") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "a"),
      (4L, 1L, ts("2024-01-01 10:03:00"), "c"),
      (5L, 2L, ts("2024-01-01 09:00:00"), "a"),
      (6L, 2L, ts("2024-01-01 09:30:00"), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Transitions.transitionMatrix(ev, "user_id",
      Seq(col("ts"), col("event_id")), "event_type")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", "b")) === ((2L, 3L, 2.0 / 3.0)))
    assert(got(("b", "a")) === ((1L, 1L, 1.0)))
    assert(got(("a", "c")) === ((1L, 3L, 1.0 / 3.0)))
    assert(got.size === 3)
    // per-from probability closure, exact as rationals: sum n == n_from
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(rows.values.map(_._1).sum === rows.values.head._2)
    }
  }

  test("streaming carry-state accumulate ≡ batch under time-sliced arrival") {
    import graft.streaming.TransitionStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_trans_stream").toString
    val dir = s"$tmp/trans"
    // u1's b→c and u2's a→b straddle the slice boundary — the carry rows
    // are the ONLY way those junctions get counted
    val all = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "b"),
      (3L, 2L, ts("2024-01-01 11:30:00"), "a"),
      (4L, 1L, ts("2024-01-02 09:00:00"), "c"),
      (5L, 2L, ts("2024-01-02 10:00:00"), "b"),
      (6L, 1L, ts("2024-01-03 08:00:00"), "a")
    )
    val df = (s: Seq[(Long, Long, java.sql.Timestamp, String)]) =>
      s.toDF("event_id", "user_id", "ts", "event_type")
    Seq(all.take(3), all.slice(3, 5), all.drop(5)).foreach { sl =>
      TransitionStream.accumulateBatch(dir, df(sl),
        "user_id", "ts", "event_id", "event_type")
    }
    val got = TransitionStream.matrix(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val want = Transitions.transitionMatrix(df(all), "user_id",
      Seq(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id")), "event_type")
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === want.toSeq,
      "accumulated matrix must equal the batch operator on the union")
    // the straddling junctions really are present
    val counts = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(counts(("b", "c")) === 1L)
    assert(counts(("a", "b")) === 2L) // u1 in-slice + u2 straddling
    // carry state is one row per user
    val last = spark.read.parquet(s"$dir/last")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(last === Map(
      1L -> ((ts("2024-01-03 08:00:00"), 6L, "a")),
      2L -> ((ts("2024-01-02 10:00:00"), 5L, "b"))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("same-timestamp ties order by event_id; nulls drop") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (Some(2L), Some(1L), t0, Some("b")),
      (Some(1L), Some(1L), t0, Some("a")), // same ts — event_id orders a before b
      (Some(3L), Some(1L), t0, Some("c")),
      (Some(4L), None, t0, Some("x")),     // null user dropped
      (Some(5L), Some(2L), t0, None)       // null state dropped
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Transitions.transitionMatrix(ev, "user_id",
      Seq(col("ts"), col("event_id")), "event_type")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got === Set(("a", "b"), ("b", "c")))
  }
}
