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

  test("thresholds validated") {
    intercept[IllegalArgumentException] {
      EntityResolution.scorePairs(a, b, Seq("blk"), scores, 1L, 5L)
    }
    intercept[IllegalArgumentException] {
      EntityResolution.scorePairs(a, b, Seq("blk"), Seq.empty, 1L, 0L)
    }
  }
}
