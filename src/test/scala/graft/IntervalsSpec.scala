package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Interval union: overlap and touch merge, gaps split, island bounds
  * and merge counts are exact, null endpoints drop, keys are isolated.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("overlap and touch merge; a gap opens a new island") {
    val iv = Seq(
      // [1,5] overlaps [3,8]; [8,9] touches (start == running end) -> one island
      ("k", d("2024-01-01"), d("2024-01-05"), 1L),
      ("k", d("2024-01-03"), d("2024-01-08"), 2L),
      ("k", d("2024-01-08"), d("2024-01-09"), 3L),
      // gap (10 > 9) -> second island
      ("k", d("2024-01-10"), d("2024-01-12"), 4L)
    ).toDF("key", "st", "en", "id")
    val got = Intervals
      .mergeIntervals(iv, Seq("key"), "st", "en", Seq(col("id")))
      .orderBy("island")
      .select("island", "island_start", "island_end", "n_merged")
      .as[(Long, Date, Date, Long)].collect().toSeq
    assert(got === Seq(
      (0L, d("2024-01-01"), d("2024-01-09"), 3L),
      (1L, d("2024-01-10"), d("2024-01-12"), 1L)))
  }

  test("a contained interval does not shrink the running end") {
    // [1,10] then [2,3]: the running max(end) stays 10, so [4,6] merges
    val iv = Seq(
      ("k", d("2024-01-01"), d("2024-01-10"), 1L),
      ("k", d("2024-01-02"), d("2024-01-03"), 2L),
      ("k", d("2024-01-04"), d("2024-01-06"), 3L)
    ).toDF("key", "st", "en", "id")
    val got = Intervals.mergeIntervals(iv, Seq("key"), "st", "en", Seq(col("id")))
      .select("island_start", "island_end", "n_merged")
      .as[(Date, Date, Long)].collect().toSeq
    assert(got === Seq((d("2024-01-01"), d("2024-01-10"), 3L)),
      "max-end (not lag(end)) is what makes containment correct")
  }

  test("streaming open-island carry ≡ batch islands under start-ordered slicing") {
    import graft.streaming.IntervalStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_iv_stream").toString
    val table = s"$tmp/islands"
    // key k: [1,5] [3,8] | [8,9] [12,14] | [13,20] [25,26]
    //   batch 2's [8,9] must reopen and grow batch 1's island; [12,14]
    //   opens a new one that batch 3's [13,20] grows again
    // key q appears only in batch 1 and must carry untouched
    val rows = Seq(
      ("k", 1, 5, 1L), ("k", 3, 8, 2L), ("q", 2, 4, 3L),
      ("k", 8, 9, 4L), ("k", 12, 14, 5L),
      ("k", 13, 20, 6L), ("k", 25, 26, 7L))
    val df = rows.map { case (g, s0, e0, id) =>
      (g, d(f"2024-01-$s0%02d"), d(f"2024-01-$e0%02d"), id)
    }.toDF("key", "st", "en", "id")
    Seq(Seq(0, 1, 2), Seq(3, 4), Seq(5, 6)).foreach { idx =>
      IntervalStream.accumulateBatch(table,
        df.where(col("id").isin(idx.map(i => rows(i)._4): _*)),
        "key", "st", "en", "id")
    }
    val got = IntervalStream.islands(spark, table)
      .select("key", "island_start", "island_end", "n_merged")
      .as[(String, Date, Date, Long)].collect().toSet
    val want = Intervals.mergeIntervals(df, Seq("key"), "st", "en",
        Seq(col("id")))
      .select("key", "island_start", "island_end", "n_merged")
      .as[(String, Date, Date, Long)].collect().toSet
    assert(got === want, "carry-state islands must replay the batch merge")
    assert(want.contains(("k", d("2024-01-01"), d("2024-01-09"), 3L)),
      "the boundary-straddling [8,9] grew the first island across batches")
    assert(want.contains(("k", d("2024-01-12"), d("2024-01-20"), 2L)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("keys are independent; null endpoints are not intervals") {
    val iv = Seq(
      ("a", Option(d("2024-01-01")), Option(d("2024-01-02")), 1L),
      ("b", Option(d("2024-01-01")), Option(d("2024-01-02")), 2L),
      ("b", Option(d("2024-01-01")), None, 3L),
      ("b", None, Option(d("2024-01-02")), 4L)
    ).toDF("key", "st", "en", "id")
    val got = Intervals.mergeIntervals(iv, Seq("key"), "st", "en", Seq(col("id")))
    assert(got.count() === 2L)
    assert(got.agg(sum("n_merged")).as[Long].head() === 2L)
  }
}
