package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Fellegi-Sunter scoring: class thresholds, missing-field neutrality,
  * blocking containment, contract checks.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(
    (1, 10L, "alice", 500L),
    (1, 11L, "bob", 720L),
    (2, 12L, "carol", 900L)
  ).toDF("blk", "a_key", "a_name", "a_v")

  private val b = Seq(
    (1, 20L, Some("ALICE"), 500L), // = alice: name+value agree
    (1, 21L, None, 700L),          // bob, name lost: value-only evidence
    (1, 22L, Some("MALLORY"), 1L), // stranger: disagrees everywhere
    (3, 23L, Some("CAROL"), 900L)  // carol's twin in ANOTHER block
  ).toDF("blk", "b_key", "b_name", "b_v")

  private def scores = Seq(
    when(col("b_name").isNull, 0L)
      .when(upper(col("a_name")) === col("b_name"), 6L).otherwise(-6L),
    when(abs(col("a_v") - col("b_v")) <= 50L, 3L).otherwise(-3L))

  test("match / possible classes; non-matches dropped; missing field scores 0") {
    val got = EntityResolution.scorePairs(a, b, Seq("blk"), scores,
      matchMin = 7L, possibleMin = 3L)
      .select("a_key", "b_key", "score", "cls")
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((10L, 20L)) === ((9L, "match")))
    assert(got((11L, 21L)) === ((3L, "possible")), "missing name → value evidence only")
    assert(!got.contains((10L, 22L)) && !got.contains((11L, 22L)),
      "strangers score below possibleMin")
    assert(!got.contains((10L, 21L)), "alice vs nameless bob: 0 - 3 < 3")
    assert(got.size === 2)
  }

  test("blocking is containment: cross-block twins are never candidates") {
    val got = EntityResolution.scorePairs(a, b, Seq("blk"), scores, 7L, 3L)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    assert(!got.contains((12L, 23L)),
      "carol's perfect twin sits in another block — blocking must not see it")
  }

  test("blockingAudit: pair volumes from counts, one-sided blocks, oversized flag") {
    val got = EntityResolution.blockingAudit(
      a.select("blk"), b.select("blk"), Seq("blk"), maxPairs = 3L)
      .select("blk", "n_a", "n_b", "n_pairs", "oversized")
      .as[(Int, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1) === ((2L, 3L, 6L, true)), "2x3 block exceeds maxPairs=3")
    assert(got(2) === ((1L, 0L, 0L, false)), "A-only block: zero pairs, coverage gap")
    assert(got(3) === ((0L, 1L, 0L, false)), "B-only block surfaces via full outer")
    assert(got.size === 3)
  }

  test("thresholdReport: cumulative precision/recall from first principles") {
    // scored pairs: scores 5(pos), 5(neg), 3(pos), 1(neg)
    val scored = Seq(
      (1L, 1L, 5L), (2L, 9L, 5L), (3L, 3L, 3L), (4L, 8L, 1L)
    ).toDF("a_key", "b_key", "score")
    val got = EntityResolution.thresholdReport(scored,
      col("a_key") === col("b_key"), precP = 2L, precQ = 3L)
      .select("threshold", "tp", "fp", "fn", "prec", "recall", "meets_target")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(5L) === ((5L, 1L, 1L, 1L, 0.5, 0.5, false)))
    assert(got(3L) === ((3L, 2L, 1L, 0L, 2.0 / 3.0, 1.0, true)),
      "precision exactly 2/3 meets the 2/3 target (>=, cross-multiplied)")
    assert(got(1L) === ((1L, 2L, 2L, 0L, 0.5, 1.0, false)))
    assert(got.size === 3, "one row per distinct score")
  }

  // banded fixtures: band = value floored to the 100-grid
  private def banded(df: org.apache.spark.sql.DataFrame, v: String, bandCol: String) =
    df.withColumn(bandCol, col(v) - ((col(v) % 100 + 100) % 100))

  test("scorePairsBanded ≡ scorePairs restricted to the ±1-band window; no dup pairs") {
    val ab = banded(a, "a_v", "a_band")
    val bb = banded(b, "b_v", "b_band")
    val got = EntityResolution.scorePairsBanded(ab, bb, Seq("blk"),
      "a_band", "b_band", step = 100L, scores, matchMin = 7L, possibleMin = -100L)
      .select("a_key", "b_key", "score").as[(Long, Long, Long)].collect()
    assert(got.length === got.distinct.length,
      "each pair must arise from exactly one band replica")
    val want = EntityResolution.scorePairs(ab, bb, Seq("blk"), scores, 7L, -100L)
      .where(abs(col("a_band") - col("b_band")) <= 100L)
      .select("a_key", "b_key", "score").as[(Long, Long, Long)].collect()
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }

  test("scorePairsBanded: beyond-window pairs are never candidates, even perfect ones") {
    // alice's value-distant twin: name agrees perfectly but sits 300 off
    val farTwin = Seq((1, 30L, Some("ALICE"), 800L)).toDF("blk", "b_key", "b_name", "b_v")
    val got = EntityResolution.scorePairsBanded(
      banded(a, "a_v", "a_band"), banded(farTwin, "b_v", "b_band"),
      Seq("blk"), "a_band", "b_band", step = 100L, scores, 7L, -100L)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    assert(!got.contains((10L, 30L)),
      "banding is containment: outside ±1 band the pair is not scored at all")
  }

  test("scorePairsBanded: adjacent-band pairs within the window survive") {
    // 10(a_v=500, band 500) vs b_v=460 (band 400): |Δ|=40 <= 50 agrees on value
    val near = Seq((1, 31L, Some("ALICE"), 460L)).toDF("blk", "b_key", "b_name", "b_v")
    val got = EntityResolution.scorePairsBanded(
      banded(a, "a_v", "a_band"), banded(near, "b_v", "b_band"),
      Seq("blk"), "a_band", "b_band", step = 100L, scores, 7L, 3L)
      .select("a_key", "b_key", "score", "cls")
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((10L, 31L)) === ((9L, "match")),
      "cross-band neighbor within the agreement window is found via the ±1 union")
  }

  test("thresholds validated") {
    intercept[IllegalArgumentException] {
      EntityResolution.scorePairs(a, b, Seq("blk"), scores, 1L, 5L)
    }
    intercept[IllegalArgumentException] {
      EntityResolution.scorePairs(a, b, Seq("blk"), Seq.empty, 1L, 0L)
    }
  }
}
