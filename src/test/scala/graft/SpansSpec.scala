package graft

import org.apache.spark.sql.functions._

import graft.operators.Spans

class SpansSpec extends SparkSpec {
  import spark.implicits._

  // shared 4-token window "a b c d" planted in docs 1 and 2 at different
  // offsets; doc 2 also shares "p q r s" with doc 3; doc 4 is clean;
  // doc 5 too short for any window; doc 6 null text
  private lazy val docs = Seq(
    (1L, "x1 x2 a b c d x3 x4 x5"),
    (2L, "a b c d y1 y2 p q r s"),
    (3L, "z1 p q r s z2 z3 z4"),
    (4L, "u1 u2 u3 u4 u5 u6 u7"),
    (5L, "v1 v2"),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("repeatedSpanStats: hand-computed coverage, merged spans, all docs present") {
    val got = Spans.repeatedSpanStats(docs, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getLong(2), Option(r.get(3)), r.getLong(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // doc 1: tokens 2..5 covered (one 4-token span)
    assert(got(1L) == ((Some(9), 4L, Some(4.0 / 9), 1L)))
    // doc 2: 0..3 and 6..9 covered — TWO maximal spans
    assert(got(2L) == ((Some(10), 8L, Some(0.8), 2L)))
    // doc 3: 1..4 covered
    assert(got(3L) == ((Some(8), 4L, Some(0.5), 1L)))
    assert(got(4L) == ((Some(7), 0L, Some(0.0), 0L)))
    assert(got(5L) == ((Some(2), 0L, Some(0.0), 0L)))
    assert(got(6L) == ((None, 0L, None, 0L)))
  }

  test("repeatedSpanStats: overlapping shared windows merge into one span") {
    // docs share a 6-token run => three overlapping 4-windows, one span
    val d = Seq(
      (1L, "m1 a b c d e f m2"),
      (2L, "a b c d e f n1 n2")
    ).toDF("doc_id", "text")
    val got = Spans.repeatedSpanStats(d, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got(1L) == ((6L, 1L)) && got(2L) == ((6L, 1L)))
  }

  test("stripRepeatedSpans rewrites text with covered tokens removed") {
    val got = Spans.stripRepeatedSpans(docs, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(3))).toMap
    assert(got(1L) == ((Some("x1 x2 x3 x4 x5"), 4L)))
    assert(got(2L) == ((Some("y1 y2"), 8L)))
    assert(got(3L) == ((Some("z1 z2 z3 z4"), 4L)))
    assert(got(4L) == ((Some("u1 u2 u3 u4 u5 u6 u7"), 0L)))
    assert(got(5L) == ((Some("v1 v2"), 0L)))
    assert(got(6L) == ((None, 0L)))
  }

  test("span pipeline shuffles the positional gram table once (ReuseExchange)") {
    // force the join-back to consume the gram exchange (broadcast would
    // bypass it) and read the AQE FINAL plan post-execution, like the
    // Boilerplate reuse test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Spans.repeatedSpanStats(docs, "doc_id", "text", k = 4, minDocs = 2)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the gram exchange to be reused:\n$plan")
      // and no window function anywhere (island math is in-row)
      assert(!plan.contains("Window"), "span arithmetic must not use windows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
