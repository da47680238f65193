package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.operators.ChangePoint

/** CUSUM change-point: the window-reduction statistic equals the hand
  * recursion, alarms localize the first crossing, in-control streams
  * stay quiet, and the statistic is non-negative by construction.
  */
class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  test("statistic equals the max(0, s+x-k) recursion on a planted shift") {
    // values 10,10,10,10,30,30,30 with allowance 12:
    // y = -2,-2,-2,-2,18,18,18; s by recursion = 0,0,0,0,18,36,54
    val vals = Seq(10L, 10L, 10L, 10L, 30L, 30L, 30L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("g", ts(i), i.toLong, v) }
      .toDF("g", "t", "id", "v")
    val got = ChangePoint.withCusum(df, "g", "t", "id", "v", allowance = 12L)
      .orderBy("id").select("s").as[Long].collect().toSeq
    val want = vals.scanLeft(0L)((s, x) => math.max(0L, s + x - 12L)).tail
    assert(got === want)
    assert(got === Seq(0L, 0L, 0L, 0L, 18L, 36L, 54L))
  }

  test("report localizes the first crossing; in-control group stays quiet") {
    val shifted = (0 until 4).map(i => ("m", ts(i), i.toLong, 10L)) ++
      (4 until 7).map(i => ("m", ts(i), i.toLong, 30L))
    val control = (0 until 7).map(i => ("c", ts(i), i.toLong, 10L + (i % 2)))
    val df = (shifted ++ control).toDF("g", "t", "id", "v")
    val rep = ChangePoint
      .cusumReport(df, "g", "t", "id", "v", allowance = 12L, threshold = 30L)
      .select("g", "n", "max_s", "alarm", "first_alarm_ts")
      .as[(String, Long, Long, Boolean, Option[Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    val m = rep("m")
    assert(m._2 === 7L && m._3 === 54L && m._4)
    // s crosses 30 at index 5 (s=36) — not at the shift itself (s=18)
    assert(m._5 === Some(ts(5)), "first alarm is the first s > H, not the shift onset")
    val c = rep("c")
    assert(c._3 === 0L && !c._4 && c._5.isEmpty,
      "values at/below allowance keep s pinned at 0")
  }

  test("streaming carry-state accumulate ≡ batch report under time slicing") {
    import graft.streaming.CusumStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusum_s").toString
    val table = s"$tmp/state"
    // group m shifts up mid-stream; group c stays in control; group z
    // appears ONLY in the first slice and must carry through untouched
    val rows = ((0 until 4).map(i => ("m", ts(i), i.toLong, 10L)) ++
      (4 until 7).map(i => ("m", ts(i), i.toLong, 30L)) ++
      (0 until 7).map(i => ("c", ts(i), i.toLong, 10L + (i % 2))) ++
      (0 until 2).map(i => ("z", ts(i), i.toLong, 40L)))
      .map { case (g, t, id, v) => (g, t.getTime, id, v) }
    val df = rows.toDF("g", "t", "id", "v")
    // three uneven TIME slices (the exactness contract: time-partitioned)
    val cuts = Seq(ts(1).getTime, ts(4).getTime)
    val slices = Seq(
      df.where(col("t") <= cuts.head),
      df.where(col("t") > cuts.head && col("t") <= cuts(1)),
      df.where(col("t") > cuts(1)))
    slices.foreach(sl =>
      CusumStream.accumulateBatch(table, sl, "g", "t", "id", "v",
        allowance = 12L, threshold = 30L))
    val got = CusumStream.verdict(spark, table, "g", 30L)
      .select("g", "n", "max_s", "alarm", "first_alarm_ts")
      .as[(String, Long, Long, Boolean, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    val want = ChangePoint
      .cusumReport(df, "g", "t", "id", "v", 12L, 30L)
      .select("g", "n", "max_s", "alarm", "first_alarm_ts")
      .as[(String, Long, Long, Boolean, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got === want, "accumulated state must replay the batch operator")
    assert(got("m")._4 && got("m")._5 === Some(ts(5).getTime))
    assert(got("z")._2 === 2L, "a group silent in later slices persists")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("statistic is never negative and resets after a downward run") {
    // deep downward excursion then one high value: s forgets the debt
    val vals = Seq(1L, 1L, 1L, 1L, 50L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("g", ts(i), i.toLong, v) }.toDF("g", "t", "id", "v")
    val got = ChangePoint.withCusum(df, "g", "t", "id", "v", allowance = 10L)
      .orderBy("id").select("s").as[Long].collect().toSeq
    assert(got.forall(_ >= 0L))
    assert(got.last === 40L, "one post-reset step counts only its own excess")
  }
}
