package graft

import org.apache.spark.sql.functions._

import graft.operators.{Backtest, Fairness}

/** Backtest + fairness: calendar-gap alignment, exact metric sums,
  * the four-fifths boundary, and rest-of-population semantics.
  */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("seasonal-naive joins on the time index, not a row lag") {
    // day 5 is MISSING: a 2-row lag would misalign day 6 onto day 3;
    // the index join scores day 6 against day 4 and day 7 against 5=none
    val ts = Seq(("g", 1L, 10L), ("g", 2L, 12L), ("g", 3L, 11L),
      ("g", 4L, 14L), ("g", 6L, 20L), ("g", 7L, 30L))
      .toDF("g", "t", "v")
    val r = Backtest.seasonalNaive(ts, "g", "t", "v", season = 2)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Double], Option[Double], Option[Double])].head()
    // scored: t=3 (f=10,e=1), t=4 (f=12,e=2), t=6 (f=14,e=6); t=7 has no
    // t=5 base -> unscored. n_points=6, n_scored=3
    assert(r._2 === 6L && r._3 === 3L)
    assert(r._4 === Some(9L), s"sum|e| = 1+2+6, got ${r._4}")
    assert(r._5 === Some(9L), s"sum e (signed) = 1+2+6, got ${r._5}")
    assert(r._6 === Some(45L), "sum|y| over scored points = 11+14+20")
    assert(r._7 === Some(3.0) && r._8 === Some(0.2))
    assert(r._9 === Some(0.2), "bias = sum_err/sum_abs_y (all errors positive here)")
  }

  test("four-fifths rule: exact boundary is NOT adverse, below is") {
    // group a: 8/20 = 0.4; rest: 10/20 = 0.5 -> ratio exactly 0.8
    def mk(posA: Int) = (
      (1 to 20).map(i => ("a", i <= posA)) ++
        (1 to 20).map(i => ("b", i <= 10))).toDF("g", "p")
    val at = Fairness.disparateImpact(mk(8), "g", col("p"))
      .where(col("g") === "a")
      .select("di_ratio", "adverse").as[(Double, Boolean)].head()
    assert(at === ((0.8, false)), "5*8*20 == 4*10*20: boundary passes")
    val below = Fairness.disparateImpact(mk(7), "g", col("p"))
      .where(col("g") === "a")
      .select("adverse").as[Boolean].head()
    assert(below, "7/20 vs 10/20 is under four fifths")
  }

  test("comparison is rest-of-population, not the diluted pool") {
    // a: 0/10, b: 10/10 -> a's rest-rate must be 1.0 (b alone), and a
    // pool comparison would report 0.5
    val df = ((1 to 10).map(_ => ("a", false)) ++
      (1 to 10).map(_ => ("b", true))).toDF("g", "p")
    val a = Fairness.disparateImpact(df, "g", col("p"))
      .where(col("g") === "a")
      .select("rest_rate", "di_ratio", "adverse")
      .as[(Option[Double], Option[Double], Option[Boolean])].head()
    assert(a._1 === Some(1.0))
    assert(a._2 === Some(0.0) && a._3 === Some(true))
  }

  test("degenerate comparisons go null: single group, or zero rest positives") {
    val solo = (1 to 5).map(_ => ("only", true)).toDF("g", "p")
    val r = Fairness.disparateImpact(solo, "g", col("p"))
      .select("rest_rate", "di_ratio", "adverse")
      .as[(Option[Double], Option[Double], Option[Boolean])].head()
    assert(r === ((None, None, None)))
  }
}
