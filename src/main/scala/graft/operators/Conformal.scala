package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (group-conditional /
  * "Mondrian" form) — the distribution-free error bar around a point
  * predictor: fit on a TRAIN split, take the nonconformity scores
  * r = |y − ŷ| on a disjoint CALIBRATION split, and the
  * ⌈(n_cal+1)(1−α)⌉-th smallest r is a radius q̂ with the finite-sample
  * marginal guarantee P(|Y − Ŷ| ≤ q̂) ≥ 1 − α per group (Vovk et al.;
  * Lei et al. JASA 2018). Where [[Bootstrap]] quantifies estimator
  * noise, this bounds PREDICTION error — no normality, no asymptotics.
  *
  * Engine shape, house rules:
  *   - the split is the growth-stable md5 hash of the row id (a
  *     re-run or a grown corpus keeps prior assignments);
  *   - ŷ is the per-group TRAIN mean as one integer-sum divide; each
  *     r = |CAST(y) − ŷ| is two correctly-rounded ops;
  *   - q̂ is an EXACT order statistic taken over the per-group score
  *     DICTIONARY (distinct r → count, cumulated in-group — bounded
  *     by distinct values, never a global sort of the calibration
  *     rows), with the rank ⌈(n+1)(1−α)⌉ computed in integers
  *     ((n+1)·(d−a) + d − 1) div d for α = a/d;
  *   - groups too small for the rank (k > n_cal) report a null q̂ —
  *     the guarantee is unattainable there and the interval must say
  *     so rather than undercover.
  */
object Conformal {

  /** Per-group split-conformal readout for an integral `valueCol`.
    * α = `alphaNum`/`alphaDen`. Output: (group, n_train, n_cal, mu,
    * qhat, lo, hi).
    */
  def splitMeanIntervals(df: DataFrame, groupCol: String, idCol: String,
                         valueCol: String, alphaNum: Int, alphaDen: Int,
                         salt: String = ":conf"): DataFrame = {
    require(alphaDen > alphaNum && alphaNum > 0,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    val clean = df.where(col(groupCol).isNotNull && col(idCol).isNotNull &&
      col(valueCol).isNotNull)
    val isTrain = Sampling.uniformFromId(col(idCol), salt) < lit(0.5)
    val train = clean.where(isTrain)
    val cal = clean.where(!isTrain)

    val mu = train.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_train"),
      (sum(col(valueCol)).cast("double") / count(lit(1)).cast("double"))
        .as("mu"))
    val scored = cal.join(mu, Seq(groupCol))
      .withColumn("__r", abs(col(valueCol).cast("double") - col("mu")))
    val dict = scored.groupBy(col(groupCol), col("__r"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = dict
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__ncal", sum(col("__cnt")).over(wAll))
      .withColumn("__k", expr(
        s"((__ncal + 1) * ${alphaDen - alphaNum} + ${alphaDen - 1})" +
          s" div $alphaDen"))
    val nCal = cal.groupBy(col(groupCol)).agg(count(lit(1)).as("n_cal"))
    val qhat = ranked.where(col("__cum") >= col("__k"))
      .groupBy(col(groupCol))
      .agg(min(col("__r")).as("qhat"))
    mu.join(nCal, Seq(groupCol), "left")
      .withColumn("n_cal", coalesce(col("n_cal"), lit(0L)))
      .join(qhat, Seq(groupCol), "left")
      .withColumn("lo", col("mu") - col("qhat"))
      .withColumn("hi", col("mu") + col("qhat"))
      .select(groupCol, "n_train", "n_cal", "mu", "qhat", "lo", "hi")
  }
}
