package graft

import graft.operators.Survival

/** Kaplan–Meier: textbook curve, censoring semantics (risk-set exit
  * without a death), the f = 0 absorbing tail, and determinism.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("textbook curve: risk sets, death counts, and the product") {
    val subj = Seq((1L, 1), (2L, 1), (2L, 1), (3L, 0), (4L, 1), (5L, 0))
      .toDF("dur", "ev")
    val got = Survival.kaplanMeier(subj, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, 6L, 1L), (2L, 5L, 2L), (4L, 2L, 1L)))
    val want = Seq(5.0 / 6.0, 5.0 / 6.0 * 3.0 / 5.0, 0.25)
    got.map(_._4).zip(want).foreach { case (s, w) =>
      assert(math.abs(s - w) / w < 1e-12,
        s"pinned-chain survival must match the product to ulps: $s vs $w")
    }
  }

  test("censoring shrinks the risk set without a drop") {
    // censored-at-3 subject is in the t=2 risk set but never a death;
    // naive 'censored = never converts' would report 1/6 at the end
    val subj = Seq((1L, 1), (2L, 1), (2L, 1), (3L, 0), (4L, 1), (5L, 0))
      .toDF("dur", "ev")
    val last = Survival.kaplanMeier(subj, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().last
    assert(last._4 > 1.0 / 6.0 + 0.05,
      "KM must sit above the censoring-as-failure curve")
  }

  test("everyone remaining dying is the absorbing f=0 tail, surv exactly 0") {
    val subj = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(subj, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) === Seq((1L, 3L, 1L), (2L, 2L, 2L)))
    assert(got.last._4 === 0.0)
    assert(got.head._4 > 0.6 && got.head._4 < 0.7)
  }

  test("partitioning-independent bit-for-bit") {
    val subj = (1 to 200).map(i => ((i % 17 + 1).toLong, i % 3 min 1))
      .toDF("dur", "ev")
    val a = Survival.kaplanMeier(subj.repartition(1), "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    val b = Survival.kaplanMeier(subj.repartition(9), "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    assert(a === b)
  }
}
