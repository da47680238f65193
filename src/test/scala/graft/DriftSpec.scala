package graft

import graft.operators.Drift

/** Discretized KS drift: planted shift detected, identical samples
  * score zero, exact threshold boundary, group-presence contract.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("planted location shift flags; identical distribution scores 0") {
    val a = ((1 to 100).map(i => ("m", i % 10 * 1.0)) ++
      (1 to 100).map(i => ("s", i % 10 * 1.0))).toDF("g", "v")
    // group m shifted by +5; group s unchanged
    val b = ((1 to 100).map(i => ("m", i % 10 * 1.0 + 5.0)) ++
      (1 to 100).map(i => ("s", i % 10 * 1.0))).toDF("g", "v")
    val got = Drift.ksDrift(a, b, "g", "v", cuts = (0 to 15).map(_.toDouble),
      tauP = 1L, tauQ = 4L)
      .select("g", "n_a", "n_b", "max_d", "ks", "drift")
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val m = got("m")
    assert(m._2 === 100L && m._3 === 100L)
    assert(m._6, s"shifted group must flag (ks=${m._5})")
    assert(m._5 === m._4.toDouble / (100.0 * 100.0))
    val s = got("s")
    assert(s._4 === 0L && s._5 === 0.0 && !s._6,
      "identical samples have zero gap at every grid point")
  }

  test("threshold is strict: gap exactly at tau does not flag") {
    // a: 4 of 8 values <= 0; b: 2 of 8 -> gap |4*8-2*8| = 16 = (1/4)*64
    val a = (Seq.fill(4)(0.0) ++ Seq.fill(4)(10.0)).map(("g", _)).toDF("g", "v")
    val b = (Seq.fill(2)(0.0) ++ Seq.fill(6)(10.0)).map(("g", _)).toDF("g", "v")
    val at = Drift.ksDrift(a, b, "g", "v", cuts = Seq(0.0, 10.0), 1L, 4L)
      .select("max_d", "drift").as[(Long, Boolean)].head()
    assert(at === ((16L, false)), "max_d*q == p*n_a*n_b is NOT drift (strict >)")
    val above = Drift.ksDrift(a, b, "g", "v", cuts = Seq(0.0, 10.0), 1L, 5L)
      .select("drift").as[Boolean].head()
    assert(above, "tighter threshold flips the verdict")
  }

  test("streaming sum-merged summary ≡ batch verdict under arbitrary slicing") {
    import graft.streaming.DriftStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift_stream").toString
    val table = s"$tmp/grid"
    val cuts = Seq(2.0, 5.0, 8.0)
    val ref = (1 to 60).map(i => ("g", i % 10 * 1.0)).toDF("g", "v")
    val live = (1 to 60).map(i => ("g", i % 10 * 1.0 + 3.0)).toDF("g", "v")
    // slice the live stream unevenly — sums don't care
    val rows = (1 to 60).map(i => ("g", i % 10 * 1.0 + 3.0))
    Seq(rows.take(7), rows.slice(7, 40), rows.drop(40)).foreach { sl =>
      DriftStream.accumulateBatch(table,
        DriftStream.partial(sl.toDF("g", "v"), "g", "v", cuts), "g", cuts)
    }
    val got = DriftStream.verdict(spark, table,
      graft.operators.Drift.summarize(ref, "g", "v", cuts), "g", cuts, 1L, 10L)
      .select("g", "n_a", "n_b", "max_d", "ks", "drift")
      .as[(String, Long, Long, Long, Double, Boolean)].head()
    val want = graft.operators.Drift.ksDrift(ref, live, "g", "v", cuts, 1L, 10L)
      .select("g", "n_a", "n_b", "max_d", "ks", "drift")
      .as[(String, Long, Long, Long, Double, Boolean)].head()
    assert(got === want, "accumulated verdict must equal the batch operator")
    assert(got._6, "the planted +3 shift must flag")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("groups must appear in both samples to be judged") {
    val a = Seq(("only_a", 1.0), ("both", 1.0)).toDF("g", "v")
    val b = Seq(("only_b", 1.0), ("both", 2.0)).toDF("g", "v")
    val gs = Drift.ksDrift(a, b, "g", "v", Seq(1.0), 1L, 2L)
      .select("g").as[String].collect().toSet
    assert(gs === Set("both"))
  }
}
