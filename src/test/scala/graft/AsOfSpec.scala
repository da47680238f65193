package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left ts") {
    val quotes = Seq(
      (1L, ts("2025-01-01 10:00:00"), 100.0),
      (1L, ts("2025-01-01 10:05:00"), 101.0),
      (2L, ts("2025-01-01 10:02:00"), 50.0)
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2025-01-01 09:59:00")), // before any quote -> null
      (11L, 1L, ts("2025-01-01 10:00:00")), // equal ts counts (>= semantics)
      (12L, 1L, ts("2025-01-01 10:04:59")), // between -> 100.0
      (13L, 1L, ts("2025-01-01 10:30:00")), // after both -> 101.0
      (14L, 2L, ts("2025-01-01 10:03:00")), // other key -> 50.0
      (15L, 3L, ts("2025-01-01 10:03:00"))  // unknown key -> null
    ).toDF("trade_id", "k", "ts")
    val got = AsOf.join(trades, quotes, "k", "ts", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(
      10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(101.0), 14L -> Some(50.0), 15L -> None))
  }

  test("as-of join matches a brute-force computation on random data") {
    val rnd = new scala.util.Random(11)
    val right = Seq.tabulate(60)(i =>
      (rnd.nextInt(5).toLong, ts(f"2025-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong))
      .distinct
    // dedupe (k, ts) keeping max payload — mirrors the deterministic-tie rule
    val rightDedup = right.groupBy(r => (r._1, r._2))
      .map { case (_, rs) => rs.maxBy(_._3) }.toSeq
    val left = Seq.tabulate(80)(i =>
      (i.toLong, rnd.nextInt(6).toLong, ts(f"2025-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30")))
    val got = AsOf.join(left.toDF("id", "k", "ts"),
        rightDedup.toDF("k", "ts", "v"), "k", "ts", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = left.map { case (id, k, t) =>
      id -> rightDedup.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
  }

  test("forward as-of with tolerance matches brute force on random data") {
    val rnd = new scala.util.Random(29)
    val right = Seq.tabulate(60)(i =>
        (rnd.nextInt(5).toLong, ts(f"2025-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong))
      .groupBy(r => (r._1, r._2)).map { case (_, rs) => rs.maxBy(_._3) }.toSeq
    val left = Seq.tabulate(80)(i =>
      (i.toLong, rnd.nextInt(6).toLong, ts(f"2025-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30")))
    val tolUs = 45L * 60 * 1000000 // 45 minutes
    val got = AsOf.join(left.toDF("id", "k", "ts"), right.toDF("k", "ts", "v"),
        "k", "ts", Seq("v"), direction = AsOf.Forward, toleranceMicros = Some(tolUs))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = left.map { case (id, k, t) =>
      val nearest = right.filter(r => r._1 == k && !r._2.before(t))
        .sortBy(r => (r._2.getTime, r._3)).headOption
      id -> nearest.filter(r => (r._2.getTime - t.getTime) * 1000 <= tolUs).map(_._3)
    }.toMap
    assert(got == expected)
    // every left row is kept, matched or not (merge_asof tolerance semantics)
    assert(got.size == left.size)
  }

  /** Review regression: the carry must match the nearest right ROW, not the
    * nearest non-null VALUE — a null-valued right row inside the tolerance
    * window yields null, never a farther row's value smuggled past the
    * tolerance check.
    */
  test("nearest right row with null value stays null under tolerance") {
    val quotes = Seq(
      (1L, ts("2025-01-01 09:00:00"), Some(5.0)),
      (1L, ts("2025-01-01 09:50:00"), None) // nearest to the trade, null value
    ).toDF("k", "ts", "v")
    val trades = Seq((10L, 1L, ts("2025-01-01 10:00:00"))).toDF("trade_id", "k", "ts")
    val got = AsOf.join(trades, quotes, "k", "ts", Seq("v"),
        toleranceMicros = Some(30L * 60 * 1000000)) // 30 min: 09:50 in, 09:00 out
      .select("trade_id", "v").head()
    assert(got.isNullAt(1),
      s"expected null (nearest row 09:50 has null v), got ${got.get(1)}")
    // and without tolerance the semantics is the same: nearest ROW's value
    val got2 = AsOf.join(trades, quotes, "k", "ts", Seq("v")).select("v").head()
    assert(got2.isNullAt(0))
  }

  test("plan: one shuffle (key window), no range join blowup") {
    val l = Seq((1L, ts("2025-01-01 10:00:00"), "x")).toDF("k", "ts", "payload")
    val r = Seq((1L, ts("2025-01-01 09:00:00"), 5.0)).toDF("k", "ts", "v")
    val plan = AsOf.join(l, r, "k", "ts", Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2) // per-side union input
  }
}
