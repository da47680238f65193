package graft

import org.apache.spark.sql.functions._

import graft.operators.Auc

/** Exact AUC: separation extremes, the textbook midrank case,
  * all-ties = exactly 1/2, and degenerate-class nulls.
  */
class AucSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): Option[Double] =
    Auc.groupedAuc(rows.map { case (s, l) => ("g", s, l) }
        .toDF("g", "s", "l"), "g", "s", col("l"))
      .select("auc").as[Option[Double]].head()

  test("perfect separation is 1.0; perfect inversion is 0.0") {
    assert(auc(Seq((10L, true), (9L, true), (2L, false), (1L, false)))
      === Some(1.0))
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false)))
      === Some(0.0))
  }

  test("textbook midrank case: pos {3,5}, neg {1,3} -> 0.875") {
    // ranks: 1->1, the tied 3s -> midrank 2.5, 5->4
    // U = (2.5 + 4) - 2*3/2 = 3.5; AUC = 3.5 / (2*2)
    assert(auc(Seq((3L, true), (5L, true), (1L, false), (3L, false)))
      === Some(0.875))
  }

  test("a score with no information is exactly 1/2") {
    assert(auc(Seq((7L, true), (7L, true), (7L, false))) === Some(0.5))
  }

  test("a missing class yields null, not a coin flip") {
    assert(auc(Seq((1L, true), (2L, true))) === None)
    assert(auc(Seq((1L, false))) === None)
  }

  test("groups are independent and tie-rank arithmetic stays integral") {
    val df = (1 to 300).map { i =>
      (s"g${i % 2}", (i % 25).toLong, i % 3 == 0)
    }.toDF("g", "s", "l")
    val got = Auc.groupedAuc(df, "g", "s", col("l"))
      .select("g", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 2)
    got.values.foreach { r =>
      assert(r._2 + r._3 === 150L)
      assert(r._4.exists(a => a >= 0.0 && a <= 1.0))
    }
    // driver-side reference: pairwise comparison with half-credit ties
    val rows = df.as[(String, Long, Boolean)].collect()
    got.keys.foreach { g =>
      val pos = rows.filter(r => r._1 == g && r._3).map(_._2)
      val neg = rows.filter(r => r._1 == g && !r._3).map(_._2)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val want = wins / (pos.length.toDouble * neg.length.toDouble)
      assert(math.abs(got(g)._4.get - want) < 1e-12,
        s"$g: U-statistic must equal the pairwise definition")
    }
  }
}
