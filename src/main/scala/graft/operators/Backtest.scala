package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forecast backtesting — grade a seasonal-naive baseline (ŷ_t =
  * y_{t−season}) against realized values, the reference point every
  * real forecasting model must beat before it ships. Joins on the
  * TIME INDEX (t − season), not a row lag: a row-lag silently
  * misaligns across calendar gaps, which is the classic backtest bug;
  * here a missing base period simply produces no forecast for that
  * point (reported in `n_scored` vs `n_points`).
  *
  * Metrics stay exact until the last op: errors are integer
  * differences, MAE = Σ|e|/n and WAPE = Σ|e|/Σ|y| and bias = Σe/Σ|y|
  * are each ONE correctly-rounded division of integer sums — no
  * per-row double means (order-dependent), no sMAPE-style per-row
  * ratios (blows up at zero actuals).
  *
  * Scale shape: one self equi-join on (group, t − season) — both
  * sides hash-partition on the same key — and one bounded rollup.
  */
object Backtest {

  /** `timeCol` integral period index, `valueCol` integral metric.
    * Output per group: n_points, n_scored, sum_abs_err, sum_err,
    * sum_abs_y, mae, wape, bias.
    */
  def seasonalNaive(df: DataFrame, groupCol: String, timeCol: String,
                    valueCol: String, season: Int): DataFrame = {
    require(season >= 1, s"season must be positive: $season")
    val clean = df.where(col(groupCol).isNotNull && col(timeCol).isNotNull &&
      col(valueCol).isNotNull)
    // fully renamed base side: a self-join through shared attribute ids
    // silently degrades the condition (Spark resolves both sides to one
    // expression) — fresh names make the equi-join unambiguous
    val base = clean.select(col(groupCol).as("__g"),
      (col(timeCol) + lit(season.toLong)).as("__t"),
      col(valueCol).as("__f"))
    val scored = clean
      .join(base, col(groupCol) === col("__g") &&
        col(timeCol) === col("__t"), "left")
      .withColumn("__e", col(valueCol) - col("__f"))
    scored.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_points"),
        count(col("__f")).as("n_scored"),
        sum(abs(col("__e"))).as("sum_abs_err"),
        sum(col("__e")).as("sum_err"),
        sum(when(col("__f").isNotNull, abs(col(valueCol)))).as("sum_abs_y"))
      .withColumn("mae",
        col("sum_abs_err").cast("double") / col("n_scored").cast("double"))
      .withColumn("wape",
        col("sum_abs_err").cast("double") / col("sum_abs_y").cast("double"))
      .withColumn("bias",
        col("sum_err").cast("double") / col("sum_abs_y").cast("double"))
  }
}
