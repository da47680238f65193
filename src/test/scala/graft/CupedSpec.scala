package graft

import org.apache.spark.sql.functions._

import graft.operators.Cuped

/** CUPED: theta recovers the planted slope, variance shrinks by ~rho²,
  * a lift invisible to the raw z is detected by the adjusted one, and
  * an A/A stays null under adjustment.
  */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  // y = 3x + arm-lift + small deterministic noise; x spread wide so the
  // covariate carries most of the variance
  private def data(lift: Long) = (1 to 800).map { i =>
    val arm = i % 2
    val x = (100 + (i * 53) % 500).toLong
    val noise = ((i * 29) % 11).toLong - 5L
    ("m", arm, x, 3L * x + noise + (if (arm == 1) lift else 0L))
  }.toDF("g", "arm", "x", "y")

  private def run(lift: Long) =
    Cuped.readout(data(lift), "g", col("arm"), "x", "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Boolean])].head()

  test("theta recovers the planted slope; variance ratio collapses") {
    val r = run(0L)
    assert(math.abs(r._4 - 3.0) < 0.05, s"theta=${r._4} should be ~3")
    assert(r._7.get < 0.01,
      s"rho~1 covariate should absorb >99% of variance, got ${r._7.get}")
  }

  test("a lift the raw z cannot see is decisive after adjustment") {
    val r = run(8L)
    assert(math.abs(r._5.get) < 1.96,
      s"raw z=${r._5.get} should drown in covariate variance")
    assert(r._8 === Some(true) && r._6.get > 1.96,
      s"CUPED z=${r._6.get} must surface the +8 lift")
  }

  test("A/A stays null after adjustment (theta cannot fabricate a lift)") {
    val r = run(0L)
    assert(r._8 === Some(false), s"A/A flagged: z_cuped=${r._6}")
  }
}
