package graft

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Mmr}

class FunnelMmrSpec extends SparkSpec {
  import spark.implicits._

  // (user, event_id, us, type)
  private lazy val ev = Seq(
    // A: the happy path -> depth 3
    (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"), (1L, 3L, 300L, "purchase"),
    // B: click BEFORE the view never qualifies -> depth 1 (view only)
    (2L, 4L, 100L, "click"), (2L, 5L, 200L, "view"), (2L, 6L, 300L, "purchase"),
    // C: view only -> depth 1
    (3L, 7L, 100L, "view"),
    // D: nothing funnel-shaped -> depth 0
    (4L, 8L, 100L, "error"),
    // E: same-timestamp view/click — the event_id tiebreak decides:
    // click's event_id is HIGHER, so the view strictly precedes -> depth 2
    (5L, 9L, 100L, "view"), (5L, 10L, 100L, "click"),
    // F: same timestamp but click's event_id is LOWER -> view does not
    // precede it -> depth 1
    (6L, 11L, 100L, "click"), (6L, 12L, 100L, "view")
  ).toDF("user_id", "event_id", "us", "event_type")

  test("funnel depth honors order, prerequisites, and the event_id tiebreak") {
    val flags = Funnel.userFlags(ev, "user_id", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(flags(1L) == ((1, 1, 1)))
    assert(flags(2L) == ((1, 0, 0))) // purchase blocked: no qualifying click
    assert(flags(3L) == ((1, 0, 0)))
    assert(flags(4L) == ((0, 0, 0)))
    assert(flags(5L) == ((1, 1, 0)))
    assert(flags(6L) == ((1, 0, 0)))
    val hist = Funnel.depthHistogram(ev, "user_id", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist == Map(0 -> 1L, 1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("stepTimes: first qualifying instants, null when a step is unreached") {
    val st = Funnel.stepTimes(ev, "user_id", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"), "us")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = st(1L) // view@100, click@200, purchase@300
    assert(a.getLong(4) == 100L && a.getLong(5) == 200L && a.getLong(6) == 300L)
    val b = st(2L) // click precedes every view: t_2/t_3 null, t_1 = 200
    assert(b.getLong(4) == 200L && b.isNullAt(5) && b.isNullAt(6))
  }

  test("funnel's window chain reuses one shuffle: a single exchange in the plan") {
    val plan = Funnel.depthHistogram(ev, "user_id", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"))
      .queryExecution.executedPlan.toString
    // one exchange for the window partition; the groupBy(user) after it is
    // co-partitioned, and only the 4-row depth histogram re-shuffles
    val winExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(winExchanges >= 1 && plan.split("Window").length - 1 == 2,
      s"expected 2 Window ops over one user partitioning:\n$plan")
  }

  test("MMR: first pick is pure relevance, later picks trade it for diversity") {
    // two near-identical high-relevance vectors + one orthogonal mid one
    val cands = Seq(
      (1L, Seq(1.0f, 0.0f), 0.99),
      (2L, Seq(0.999f, 0.01f), 0.98), // near-clone of 1
      (3L, Seq(0.0f, 1.0f), 0.50)
    ).toDF("id", "vec", "score")
    val picks = Mmr.rerank(cands, "id", "vec", "score", k = 3, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(picks(0) == ((1, 1L))) // top relevance first
    // clone of 1 is punished by its ~1.0 sim to the selected set; the
    // orthogonal doc 3 wins the second slot despite lower relevance
    assert(picks(1) == ((2, 3L)))
    assert(picks(2) == ((3, 2L)))
  }

  test("MMR with lambda=1 reduces to relevance order and ties break to lower id") {
    val cands = Seq(
      (7L, Seq(1.0f, 0.0f), 0.9),
      (5L, Seq(0.0f, 1.0f), 0.9), // tied score — lower id must come first
      (9L, Seq(0.5f, 0.5f), 0.8)
    ).toDF("id", "vec", "score")
    val picks = Mmr.rerank(cands, "id", "vec", "score", k = 3, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(picks == Seq(5L, 7L, 9L))
  }
}
