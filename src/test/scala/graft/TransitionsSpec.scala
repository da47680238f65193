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
