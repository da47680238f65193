package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.operators.{Cooccur, Outliers, Upsert}

/** SCD-2 history intervals, co-occurrence lift, and the Outliers
  * train/apply split (the batch profile applied to other data).
  */
class CooccurHistorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ------------------------------------------------------------ scd2History

  private lazy val changes = Seq(
    (100L, 1L, ts("2025-01-01 10:00:00"), "created"),
    (100L, 2L, ts("2025-01-01 11:00:00"), "updated"),
    (100L, 3L, ts("2025-01-01 12:00:00"), "archived"),
    (200L, 4L, ts("2025-01-01 10:30:00"), "created")
  ).toDF("key", "change_id", "ts", "state")

  test("scd2History: intervals chain, last version is current, keys isolated") {
    val out = Upsert.scd2History(changes, Seq("key"), Seq("ts", "change_id"))
      .select("key", "change_id", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Timestamp, Option[Timestamp], Boolean)]
      .collect().map(r => r._2 -> r).toMap
    assert(out(1L)._4.contains(ts("2025-01-01 11:00:00")),
      "version 1 closes when version 2 opens")
    assert(out(2L)._4.contains(ts("2025-01-01 12:00:00")))
    assert(out(3L)._4.isEmpty && out(3L)._5, "last version open and current")
    assert(out(4L)._4.isEmpty && out(4L)._5,
      "other key's single version is current — no cross-key leakage")
    assert(out(1L)._3 == ts("2025-01-01 10:00:00"), "valid_from = own ts")
  }

  test("applyChangeLog: I/U collapse to latest, trailing D removes the key, D-then-I resurrects") {
    val log = Seq(
      (1L, "a1", 1L, "I"), (1L, "a2", 2L, "U"),             // plain update
      (2L, "b1", 1L, "I"), (2L, "b1", 2L, "D"),             // deleted
      (3L, "c1", 1L, "I"), (3L, "c1", 2L, "D"), (3L, "c2", 3L, "I"), // resurrected
      (4L, "d1", 1L, "I")                                    // untouched
    ).toDF("k", "v", "version", "op")
    val got = Upsert.applyChangeLog(log, Seq("k"), "version", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a2", 2L), (3L, "c2", 3L), (4L, "d1", 1L)))
    // shape: one hash aggregate, no window exec
    val plan = Upsert.applyChangeLog(log, Seq("k"), "version", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("snapshotDiff: added/removed/changed with column attribution; null-safe") {
    val old = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, Some("c"), 30L), (4L, None: Option[String], 40L)
    ).toDF("k", "v", "n")
    val cur = Seq(
      (1L, Some("a"), 10L),                 // unchanged -> absent from diff
      (2L, Some("B"), 21L),                 // both cols changed
      (4L, Some("d"), 40L),                 // null -> value IS a change
      (5L, None: Option[String], 50L)       // added (with a null col)
    ).toDF("k", "v", "n")
    val got = Upsert.snapshotDiff(old, cur, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (2L, "changed", Some("v,n")),
      (3L, "removed", None),
      (4L, "changed", Some("v")),
      (5L, "added", None)))
  }

  test("scd2History: every non-final valid_to equals the next valid_from (no gaps)") {
    val rows = Upsert.scd2History(changes, Seq("key"), Seq("ts", "change_id"))
      .select("key", "valid_from", "valid_to")
      .as[(Long, Timestamp, Option[Timestamp])].collect()
    rows.groupBy(_._1).values.foreach { hist =>
      val sorted = hist.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => // single-version key
      }
      assert(sorted.init.forall(_._3.isDefined) && sorted.last._3.isEmpty)
    }
  }

  // ------------------------------------------------------------ Cooccur.lift

  private lazy val occ = Seq(
    (1L, "a"), (1L, "b"), (1L, "a"), // duplicate (1,a) must collapse
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c")
  ).toDF("u", "l")

  test("lift: counts and lift from first principles; duplicates collapse") {
    val out = Cooccur.lift(occ, "u", "l")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // N=3 containers; n_a=3, n_b=2, n_c=1; ab co-occurs in {1,2}, ac in {3}
    val ab = out(("a", "b"))
    assert(ab._3 == 3 && ab._4 == 2 && ab._5 == 2)
    assert(ab._6 == 2.0 * 3.0 / (3.0 * 2.0)) // lift 1.0: b occurs iff a does anyway
    val ac = out(("a", "c"))
    assert(ac._5 == 1 && ac._6 == 1.0 * 3.0 / (3.0 * 1.0))
    assert(!out.contains(("b", "c")), "never co-occur -> no row")
    assert(out.keys.forall { case (x, y) => x < y }, "unordered pairs, a < b")
  }

  test("lift: null containers/labels dropped; totals joined broadcast") {
    val withNull = occ.union(Seq((4L, null.asInstanceOf[String])).toDF("u", "l"))
    val out = Cooccur.lift(withNull, "u", "l")
    // null label adds no container holding any label: N stays 3 → same lift
    val ab = out.where($"label_a" === "a" && $"label_b" === "b")
      .select("lift").as[Double].head()
    assert(ab == 1.0)
    val plan = out.queryExecution.sparkPlan
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2,
      "label totals must broadcast onto the pair counts")
  }

  // ------------------------------------ Cooccur.associationRules

  test("associationRules: direction, support floor, exact confidence gate") {
    // 6 baskets: a,b together in 4; c with a in 2; d appears once (infrequent)
    val baskets = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, "a"), (4L, "b"),
      (5L, "a"), (5L, "c"),
      (6L, "b"), (6L, "d")
    ).toDF("u", "l")
    // minSupport 2, confidence >= 3/5
    val out = Cooccur.associationRules(baskets, "u", "l", 2L, 3L, 5L)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // n_a=5, n_b=5, n_c=2, n_ab=4, n_ac=2; d never pairs frequently
    // conf(a=>b)=4/5 keeps; conf(b=>a)=4/5 keeps; conf(a=>c)=2/5 DROPS
    // at exactly-below; conf(c=>a)=2/2=1 keeps
    assert(out.keySet === Set(("a", "b"), ("b", "a"), ("c", "a")))
    val ab = out(("a", "b"))
    assert(ab._3 == 5 && ab._4 == 5 && ab._5 == 4)
    assert(ab._6 == 4.0 / 5.0)
    assert(ab._7 == 4.0 * 6.0 / (5.0 * 5.0))
    val ca = out(("c", "a"))
    assert(ca._3 == 2 && ca._6 == 1.0)
    assert(!out.contains(("a", "c")), "2/5 < 3/5 must drop — exact rational gate")
    assert(out.keys.forall { case (x, y) => !x.contains("d") && !y.contains("d") },
      "infrequent item pruned before pairing")
  }

  test("associationRules: boundary confidence exactly at p/q is kept") {
    // conf(x=>y) = 2/4 with gate 1/2: cross-multiplication keeps equality
    val b2 = Seq((1L, "x"), (1L, "y"), (2L, "x"), (3L, "x"), (4L, "x"), (4L, "y"))
      .toDF("u", "l")
    val out = Cooccur.associationRules(b2, "u", "l", 2L, 1L, 2L)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(out.contains(("x", "y")), "n_ab*q == p*n_ant must pass (>=, not >)")
  }

  // ------------------------------------- Outliers train/apply (flagAgainst)

  test("flagAgainst: yesterday's profile flags today's drift") {
    val monday = Seq(("m", 10.0), ("m", 11.0), ("m", 9.0), ("m", 10.0), ("m", 12.0))
      .toDF("g", "v")
    val profile = Outliers.stats(monday, "g", "v")
    val tuesday = Seq((1L, "m", 10.5), (2L, "m", 500.0)).toDF("id", "g", "v")
    val out = Outliers.flagAgainst(tuesday, profile, "g", "v", z = 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && out(2L),
      "new data judged against the TRAINED median/MAD, not its own")
  }
}
