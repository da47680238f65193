package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Calibrate

/** PAV minimax isotonic fit + reliability/ECE readout. */
class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  /** Rows = (score, label) expanded to one row per observation. */
  private def obs(rows: (Int, Int, Int)*): DataFrame =
    // (score, n_neg, n_pos)
    rows.flatMap { case (s, n0, n1) =>
      Seq.fill(n0)((s, false)) ++ Seq.fill(n1)((s, true))
    }.toDF("score", "y")

  private def fitMap(df: DataFrame): Map[Int, Double] =
    Calibrate.isotonicFit(df, "score", col("y"))
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap

  test("already-monotone rates pass through unchanged") {
    val m = fitMap(obs((1, 9, 1), (2, 5, 5), (3, 1, 9)))
    assert(m === Map(1 -> 0.1, 2 -> 0.5, 3 -> 0.9))
  }

  test("a violating adjacent pair pools to its weighted average") {
    // rates 0.2, 0.8, 0.5 — PAV pools bins 2,3: (8+5)/20 = 0.65
    val m = fitMap(obs((1, 8, 2), (2, 2, 8), (3, 5, 5)))
    assert(m(1) === 0.2 && m(2) === 0.65 && m(3) === 0.65)
  }

  test("unequal weights pool to the weighted, not arithmetic, mean") {
    // rates 0.9 then 0.0 with weights 10 and 30: pooled = 9/40 = 0.225
    val m = fitMap(obs((1, 1, 9), (2, 30, 0)))
    assert(m(1) === 0.225 && m(2) === 0.225)
  }

  test("a global violation pools everything to the overall rate") {
    val m = fitMap(obs((1, 0, 10), (2, 5, 5), (3, 10, 0)))
    assert(m.values.toSet === Set(0.5))
  }

  test("fit is non-decreasing and bracketed by [0,1] on random data") {
    val rng = new scala.util.Random(7)
    val df = (1 to 2000).map { _ =>
      (rng.nextInt(12), rng.nextDouble() < 0.4)
    }.toDF("score", "y")
    val rows = Calibrate.isotonicFit(df, "score", col("y"))
      .orderBy("score").collect()
    val fits = rows.map(_.getDouble(4))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b })
    assert(fits.forall(f => f >= 0.0 && f <= 1.0))
    // pooled means conserve mass: Σ n·fit = Σ pos (PAV block property)
    val sumFit = rows.map(r => r.getLong(1) * r.getDouble(4)).sum
    val sumPos = rows.map(_.getLong(2)).sum
    assert(math.abs(sumFit - sumPos) < 1e-6)
  }

  test("reliability: carry-forward conf, gap, and hand-computed ECE") {
    val train = obs((1, 9, 1), (3, 5, 5), (5, 1, 9))
    val fit = Calibrate.isotonicFit(train, "score", col("y"))
    // eval has an unseen interior score (4 → conf of score 3) and an
    // unseen score below every trained bin (0 → null conf, weight 0)
    val eval = obs((0, 1, 1), (1, 8, 2), (4, 4, 6), (5, 0, 10))
    val rel = Calibrate.reliability(eval, "score", col("y"), fit)
      .orderBy("score").collect()
    val byScore = rel.map(r => r.getInt(0) ->
      (Option(r.get(4)).map(_.asInstanceOf[Double]), r.getDouble(3))).toMap
    assert(byScore(0)._1.isEmpty)            // below min trained score
    assert(byScore(1)._1.contains(0.1))
    assert(byScore(4)._1.contains(0.5))      // carried forward from 3
    assert(byScore(5)._1.contains(0.9))
    // ECE = (10*|0.1-0.2| + 10*|0.5-0.6| + 10*|0.9-1.0|) / 32
    val ece = rel.head.getDouble(6)
    assert(math.abs(ece - 3.0 / 32.0) < 1e-12)
    assert(rel.map(_.getDouble(6)).distinct.length === 1)
  }

  test("perfectly calibrated eval yields ECE 0") {
    val train = obs((1, 9, 1), (2, 1, 9))
    val fit = Calibrate.isotonicFit(train, "score", col("y"))
    val eval = obs((1, 9, 1), (2, 1, 9))
    val ece = Calibrate.reliability(eval, "score", col("y"), fit)
      .select("ece").head().getDouble(0)
    assert(ece === 0.0)
  }

  test("an unbinned continuous score fails the alphabet guard loudly") {
    // 500 distinct scores vs maxAlphabet=100: the guard must fire BEFORE
    // the |alphabet|^2 stage, naming the binning escape hatch
    val wide = (1 to 500).map(i => (i.toDouble / 500.0, i % 2 == 0))
      .toDF("score", "y")
    val e = intercept[IllegalArgumentException] {
      Calibrate.isotonicFit(wide, "score", col("y"), maxAlphabet = 100)
    }
    assert(e.getMessage.contains("withEquiDepthBin"))
    // and the same data binned passes (scores span (0,1], so floor(s*10)
    // lands in 1..10 for s in (0,1) plus the s=1.0 bin boundary: 11 bins)
    val binned = wide.withColumn("score",
      floor(col("score") * 10).cast("long"))
    assert(Calibrate.isotonicFit(binned, "score", col("y"), maxAlphabet = 100)
      .count() === 11L)
  }
}
