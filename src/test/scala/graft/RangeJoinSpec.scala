package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval equals brute force, inclusive bounds") {
    val rnd = new scala.util.Random(5)
    val points = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(1000).toLong))
    val intervals = Seq.tabulate(40) { j =>
      val lo = rnd.nextInt(950).toLong
      (j.toLong, lo, lo + rnd.nextInt(120).toLong)
    }
    val got = RangeJoin.pointInInterval(
        points.toDF("pid", "x"), intervals.toDF("iid", "lo", "hi"),
        "x", "lo", "hi", bucketWidth = 64)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, x) <- points
      (iid, lo, hi) <- intervals
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("no nested-loop join in the plan; equi-join on bucket") {
    val df = RangeJoin.pointInInterval(
      Seq((1L, 10L)).toDF("pid", "x"),
      Seq((1L, 5L, 15L)).toDF("iid", "lo", "hi"),
      "x", "lo", "hi", bucketWidth = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join degenerated:\n$plan")
  }

  test("extra equi keys restrict matches") {
    val points = Seq((1L, "u1", 10L), (2L, "u2", 10L)).toDF("pid", "u", "x")
    val intervals = Seq((100L, "u1", 0L, 20L)).toDF("iid", "u", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi",
        bucketWidth = 16, keyCols = Seq("u"))
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
