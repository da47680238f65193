package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential change-point detection — the WHEN to [[Drift]]'s WHETHER:
  * the two-sample KS monitor compares two caller-chosen windows, while
  * the one-sided CUSUM watches a single ordered stream per group and
  * localizes the first moment the running mean drifted above the
  * `allowance`. The classic recursion s_i = max(0, s_{i-1} + x_i − k)
  * is sequential, but the prefix-min identity
  *
  *   s_i = c_i − min(0, min_{j≤i} c_j),   c_i = Σ_{j≤i} (x_j − k)
  *
  * turns it into TWO running window aggregates (a running sum and a
  * running min), so the whole detector is one hash-partition by group
  * + one in-partition sort — no iteration, no state, no global sort;
  * exactly the shape that survives 100 TB (each group's stream sorts
  * inside its own partition; skewed groups are a [[Skew]] salting
  * question upstream, not a detector question).
  *
  * Everything is integer-exact: callers feed an integer `valueCol`
  * (e.g. cents), `allowance` (the tolerated per-observation mean, same
  * scale) and `threshold` (the alarm level H, same scale) are longs, so
  * c, the running min, and s are all exact — the report carries no
  * floats at all and the alarm verdict needs no epsilon.
  *
  * Reference behavior analog: the reference refreshes its derived
  * stats by full recomputation per run
  * (`02_method2_manual_vector_embedding.sql:15-40` rebuilds the whole
  * embedding table); a CUSUM over the same stream answers the
  * monitoring question with one ordered pass and localizes the shift,
  * which full-window recomputation cannot.
  */
object ChangePoint {

  /** Per-row CUSUM statistic `s` over `df`, ordered inside each group
    * by (`tsCol`, `tieCol`) — the tie column makes the order total, so
    * the statistic is deterministic under any partitioning.
    */
  def withCusum(df: DataFrame, groupCol: String, tsCol: String,
                tieCol: String, valueCol: String, allowance: Long,
                outCol: String = "s"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(valueCol) - lit(allowance)).over(w)
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__cum", cum)
      .withColumn(outCol, col("__cum") - least(lit(0L), min(col("__cum"))
        .over(w)))
      .drop("__cum")
  }

  /** The monitoring report: per group, n, the peak statistic, whether
    * it ever crossed `threshold`, and the timestamp of the FIRST
    * crossing (null when the group never alarmed). |groups| rows out.
    */
  def cusumReport(df: DataFrame, groupCol: String, tsCol: String,
                  tieCol: String, valueCol: String, allowance: Long,
                  threshold: Long): DataFrame = {
    require(threshold > 0, s"alarm threshold must be positive: $threshold")
    val scored = withCusum(df, groupCol, tsCol, tieCol, valueCol, allowance)
    scored.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("s")).as("max_s"),
        (max(col("s")) > lit(threshold)).as("alarm"),
        min(when(col("s") > lit(threshold), col(tsCol)))
          .as("first_alarm_ts"))
  }
}
