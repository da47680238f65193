package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence intervals — the error bar for any KPI
  * the engine reports, computed the only way that distributes: each
  * row draws an independent Poisson(1) replication weight per
  * resample (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", Google 2012 — the classic n-out-of-n bootstrap
  * needs a global sample of exactly n WITH replacement, which is a
  * coordination point; Poisson(1) weights approximate it row-locally
  * with no coordination at all).
  *
  * Determinism and bit-portability, the house rules:
  *   - the weight u-draw is the md5 hash-uniform of (row id # resample
  *     index) — re-runs, repartitions, and both engines agree;
  *   - the Poisson(1) inverse CDF is a literal threshold ladder
  *     ([[PoissonCdf1]] — nine doubles embedded in BOTH plans, capped
  *     at w = 9, P(X > 9) ≈ 1e-7: a fixed quantization both engines
  *     share, not a runtime transcendental);
  *   - each resample mean is a ratio of INTEGER sums (Σwx / Σw — one
  *     correctly-rounded divide), and the CI bounds are order
  *     statistics of those B means (rank ties broken by resample
  *     index), so the interval is exact given the draws.
  *
  * Scale shape: the row stream explodes ×B map-side (the documented
  * cost knob — B=100 means one extra pass over 100× the rows, still
  * one shuffle keyed (group, resample)), the rank window runs on
  * |groups|×B rows. Rows with null id/value never resample.
  */
object Bootstrap {

  /** P(Poisson(1) ≤ k) for k = 0..8, shortest-repr doubles — the ONE
    * source both the Column ladder and the SQL twin are generated from.
    */
  val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** Replication weight from a uniform draw: the inverse-CDF ladder. */
  def poissonWeight(u: Column): Column =
    PoissonCdf1.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (c, k)) =>
        val cond = u < lit(c)
        Some(acc.fold(when(cond, lit(k.toLong)))(_.when(cond, lit(k.toLong))))
    }.get.otherwise(lit(PoissonCdf1.size.toLong))

  /** The identical ladder as DuckDB SQL over a uniform expression. */
  def poissonWeightSql(uExpr: String): String =
    PoissonCdf1.zipWithIndex.map { case (c, k) =>
      s"WHEN $uExpr < CAST($c AS DOUBLE) THEN CAST($k AS BIGINT)"
    }.mkString("CASE ", " ", s" ELSE CAST(${PoissonCdf1.size} AS BIGINT) END")

  /** Per-group point estimate + bootstrap CI: the rank-`rankLo` and
    * rank-`rankHi` smallest of `b` resample means (for a 95% interval
    * with b = 100: ranks 3 and 98). Output: (group, n, mean_hat,
    * ci_lo, ci_hi).
    */
  def meanCi(df: DataFrame, groupCol: String, idCol: String,
             valueCol: String, b: Int, rankLo: Int, rankHi: Int,
             salt: String = ":boot"): DataFrame = {
    require(b >= 2 && rankLo >= 1 && rankHi <= b && rankLo < rankHi,
      s"bad bootstrap config b=$b ranks=$rankLo/$rankHi")
    val clean = df.where(col(groupCol).isNotNull && col(idCol).isNotNull &&
      col(valueCol).isNotNull)
    val point = clean.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      (sum(col(valueCol)).cast("double") / count(lit(1)).cast("double"))
        .as("mean_hat"))
    val drawn = clean
      .withColumn("__b", explode(sequence(lit(1), lit(b))))
      .withColumn("__u", Sampling.uniformFromId(
        concat(col(idCol).cast("string"), lit("#"),
          col("__b").cast("string")), salt))
      .withColumn("__w", poissonWeight(col("__u")))
    val means = drawn.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w")).as("__sw"),
        sum(col("__w") * col(valueCol)).as("__swx"))
      .where(col("__sw") > 0L)
      .withColumn("__mean",
        col("__swx").cast("double") / col("__sw").cast("double"))
    val ranked = means.withColumn("__r", row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col("__mean"), col("__b"))))
    val ci = ranked.groupBy(col(groupCol)).agg(
      min(when(col("__r") === rankLo, col("__mean"))).as("ci_lo"),
      min(when(col("__r") === rankHi, col("__mean"))).as("ci_hi"))
    point.join(ci, Seq(groupCol))
  }
}
