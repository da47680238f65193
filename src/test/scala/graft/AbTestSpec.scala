package graft

import org.apache.spark.sql.functions._

import graft.operators.AbTest

/** Welch readout: hand-computed z, A/A null result, planted-lift
  * detection with the right sign, and the underpowered-arm guard.
  */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("z matches the hand-computed Welch statistic") {
    // a: 1,2,3 (mean 2, var 1); b: 4,6 (mean 5, var 2)
    val df = Seq(("m", 0, 1L), ("m", 0, 2L), ("m", 0, 3L),
      ("m", 1, 4L), ("m", 1, 6L)).toDF("g", "arm", "v")
    val r = AbTest.welchReadout(df, "g", col("arm"), "v")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(r._2 === 3L && r._3 === 2L)
    assert(r._4 === 2.0 && r._5 === 5.0)
    val want = (5.0 - 2.0) / math.sqrt(1.0 / 3.0 + 2.0 / 2.0)
    assert(math.abs(r._6.get - want) < 1e-15)
    assert(r._7 === Some(true), s"z=${r._6.get} clears 1.96")
  }

  test("A/A split is not significant; planted lift is, with sign") {
    val base = (1 to 400).map(i => ("m", i % 2, (100 + i % 7).toLong))
    val aa = AbTest.welchReadout(base.toDF("g", "arm", "v"), "g",
      col("arm"), "v")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(aa._7 === Some(false), s"A/A flagged significant: z=${aa._6}")
    val lifted = base.map { case (g, arm, v) =>
      (g, arm, if (arm == 1) v + 5L else v) }
    val ab = AbTest.welchReadout(lifted.toDF("g", "arm", "v"), "g",
      col("arm"), "v")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(ab._7 === Some(true) && ab._6.get > 0,
      s"planted +5 lift on b must flag positive: z=${ab._6}")
  }

  test("an arm with n <= 1 yields a null z, not NaN") {
    val df = Seq(("m", 0, 5L), ("m", 0, 7L), ("m", 1, 9L))
      .toDF("g", "arm", "v")
    val r = AbTest.welchReadout(df, "g", col("arm"), "v")
      .select("z", "significant")
      .as[(Option[Double], Option[Boolean])].head()
    assert(r === ((None, None)))
  }
}
