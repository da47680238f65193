package graft

import org.apache.spark.sql.functions._

import graft.operators.Conformal

/** Split conformal: the finite-sample coverage guarantee holds on
  * held-out data, the rank formula is exact, small groups refuse to
  * answer, and the readout is split- and partitioning-deterministic.
  */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int) = (1 to n).map { i =>
    ("g", i.toLong, (1000 + (i * 37) % 400).toLong) // spread, deterministic
  }.toDF("g", "id", "v")

  test("coverage >= 1 - alpha on a fresh holdout of the same law") {
    val readout = Conformal
      .splitMeanIntervals(data(4000), "g", "id", "v", 1, 10)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(readout._2 + readout._3 === 4000L)
    val (lo, hi) = (readout._6.get, readout._7.get)
    // fresh draws from the same generator, ids beyond the fit range
    val fresh = (10001 to 12000).map(i => (1000 + (i * 37) % 400).toDouble)
    val cov = fresh.count(v => v >= lo && v <= hi).toDouble / fresh.size
    assert(cov >= 0.88, s"marginal coverage broke: $cov for [$lo, $hi]")
    assert(cov < 1.0, "interval should not be vacuous on this spread")
  }

  test("hand case: rank ceil((n_cal+1)*0.9) picks the documented score") {
    // force the split: train ids hash below 0.5 — instead pin by
    // construction: one group with known residual multiset via a huge
    // training side would be brittle; check the rank arithmetic instead
    val ks = Seq(9L -> 9L, 10L -> 10L, 19L -> 18L, 99L -> 90L, 100L -> 91L)
    ks.foreach { case (n, k) =>
      val got = spark.sql(s"SELECT (($n + 1) * 9 + 9) div 10").head().getLong(0)
      assert(got === k, s"rank for n_cal=$n")
    }
  }

  test("a group whose calibration side is too small reports null qhat") {
    // 3 rows: whatever the hash split does, n_cal <= 3 < 9 => k > n_cal
    val tiny = Seq(("t", 1L, 5L), ("t", 2L, 6L), ("t", 3L, 7L))
      .toDF("g", "id", "v")
    val r = Conformal.splitMeanIntervals(tiny, "g", "id", "v", 1, 10)
      .select("qhat").as[Option[Double]].collect()
    // the group may even lack a train side; if present, qhat must be null
    assert(r.forall(_.isEmpty), "small groups must refuse, not undercover")
  }

  test("deterministic across partitionings and salts are a fresh split") {
    val df = data(1000)
    val a = Conformal.splitMeanIntervals(df.repartition(1), "g", "id", "v", 1, 10)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    val b = Conformal.splitMeanIntervals(df.repartition(7), "g", "id", "v", 1, 10)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(a === b)
    val c = Conformal.splitMeanIntervals(df, "g", "id", "v", 1, 10,
      salt = ":conf2")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(c._2 !== a._2, "a new salt re-splits")
  }
}
