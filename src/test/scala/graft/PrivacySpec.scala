package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Seeded Laplace release: determinism under repartitioning, exact
  * 1/ε scaling, distribution-shape sanity, and the release clamp.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def groups(n: Int) =
    (1 to n).flatMap(g => Seq.fill(5 + g % 7)(s"g$g")).toDF("g")

  test("noise is a pure function of (group, salt): repartition-stable") {
    val df = groups(50)
    val a = Privacy.noisyCounts(df.repartition(1), Seq("g"), 0.5, salt = ":dp")
      .select("g", "noisy_n").as[(String, Double)].collect().toMap
    val b = Privacy.noisyCounts(df.repartition(13), Seq("g"), 0.5, salt = ":dp")
      .select("g", "noisy_n").as[(String, Double)].collect().toMap
    assert(a === b, "same bits under any partitioning")
    val c = Privacy.noisyCounts(df, Seq("g"), 0.5, salt = ":dp2")
      .select("g", "noisy_n").as[(String, Double)].collect().toMap
    assert(a.keySet === c.keySet && a.exists { case (k, v) => c(k) != v },
      "a new salt is a new release epoch with fresh noise")
  }

  test("halving epsilon exactly doubles every noise draw (b = 1/eps)") {
    val df = groups(40)
    val n1 = Privacy.noisyCounts(df, Seq("g"), 1.0, salt = ":dp")
      .select("g", "noise").as[(String, Double)].collect().toMap
    val n05 = Privacy.noisyCounts(df, Seq("g"), 0.5, salt = ":dp")
      .select("g", "noise").as[(String, Double)].collect().toMap
    n1.foreach { case (g, v) =>
      assert(n05(g) === v * 2.0, s"power-of-two rescale must be exact ($g)")
    }
  }

  test("draws look Laplace(2): sign balance and mean |noise| near b") {
    val noise = Privacy.noisyCounts(groups(400), Seq("g"), 0.5, salt = ":dp")
      .select("noise").as[Double].collect()
    assert(noise.length === 400)
    val pos = noise.count(_ > 0)
    assert(pos > 120 && pos < 280, s"sign balance off: $pos/400 positive")
    val meanAbs = noise.map(math.abs).sum / noise.length
    assert(meanAbs > 1.0 && meanAbs < 4.0,
      s"E|Laplace(b=2)| = 2; got $meanAbs")
    assert(noise.map(math.abs).max < 22.18 * 2.0 + 1e-9,
      "the 2^-32 w-clamp bounds the tail")
  }

  test("the salt is a required secret key: empty salt is rejected") {
    intercept[IllegalArgumentException] {
      Privacy.noisyCounts(groups(3), Seq("g"), 0.5, salt = "")
    }
  }

  test("released counts are non-negative integers near the truth") {
    val rel = Privacy.noisyCounts(groups(100), Seq("g"), 0.5, salt = ":dp")
      .select("n", "released_n").as[(Long, Long)].collect()
    assert(rel.forall(_._2 >= 0L), "negative counts never release")
    assert(rel.forall { case (n, r) => math.abs(r - n) <= 50L },
      "noise at eps=0.5 stays within the clamp-bounded tail")
  }
}
