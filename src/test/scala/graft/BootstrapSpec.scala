package graft

import org.apache.spark.sql.functions._

import graft.operators.Bootstrap

/** Poisson bootstrap: ladder unit behavior, CI coverage + width
  * shrinkage with n, and partitioning determinism.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("weight ladder: hand-picked uniforms hit the documented weights") {
    val us = Seq(0.1, 0.36787944117144233, 0.5, 0.9, 0.99, 0.9999999)
    val got = us.toDF("u").select(Bootstrap.poissonWeight(col("u")))
      .as[Long].collect().toSeq
    // 0.1 < cdf(0) -> 0; cdf(0) itself is NOT < cdf(0) -> 1; 0.5 -> 1;
    // 0.9 -> 2; 0.99 -> 4; 0.9999999 clears every ladder rung -> cap 9
    assert(got === Seq(0L, 1L, 1L, 2L, 4L, 9L))
  }

  test("weights average ~1 so resample mass matches the sample") {
    val df = (1L to 5000L).toDF("id")
      .select(Bootstrap.poissonWeight(
        graft.operators.Sampling.uniformFromId(col("id"), ":wtest")))
      .as[Long].collect()
    val m = df.sum.toDouble / df.length
    assert(m > 0.94 && m < 1.06, s"mean Poisson(1) weight drifted: $m")
  }

  test("CI brackets the point estimate and tightens with sample size") {
    def data(n: Int) =
      (1 to n).map(i => ("g", i.toLong, (1000 + i % 201).toLong))
        .toDF("g", "id", "v")
    def ci(n: Int) = Bootstrap
      .meanCi(data(n), "g", "id", "v", b = 100, rankLo = 3, rankHi = 98)
      .as[(String, Long, Double, Double, Double)].head()
    val small = ci(200)
    val big = ci(5000)
    for (r <- Seq(small, big)) {
      assert(r._4 < r._3 && r._3 < r._5,
        s"CI [${r._4}, ${r._5}] must bracket the mean ${r._3}")
    }
    assert((big._5 - big._4) < (small._5 - small._4) / 2.0,
      "25x the data should shrink the interval by ~5x")
  }

  test("bit-identical under repartitioning") {
    val df = (1 to 700).map(i => (s"g${i % 3}", i.toLong, (i % 50).toLong))
      .toDF("g", "id", "v")
    val a = Bootstrap.meanCi(df.repartition(1), "g", "id", "v", 50, 2, 49)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val c = Bootstrap.meanCi(df.repartition(13), "g", "id", "v", 50, 2, 49)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a === c)
  }
}
