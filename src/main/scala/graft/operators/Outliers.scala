package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: flag rows with
  * |v - median| > z * MAD (MAD = median absolute deviation) — the
  * median/MAD pair instead of mean/stddev, so heavy tails and the
  * outliers themselves cannot mask the detection (stddev grows with the
  * very anomalies it is meant to find; the 50th percentile ignores them).
  * The data-quality sweep a training pipeline runs over numeric telemetry
  * (durations, distances, sensor readings) before trusting aggregates.
  *
  * Plan shape is the [[Gate]] two-pass form, twice: each pass is one
  * grouped aggregation whose (small, bounded-cardinality) result
  * broadcasts back onto the row stream — no window function ever sorts a
  * group in one task, and the row stream itself is never shuffled (both
  * joins are broadcast, both flags map-side). Groups are assumed
  * bounded (event types, sensor classes — classes, not keys).
  *
  * The train/apply split is explicit: [[stats]] produces the bounded
  * per-group profile, [[flagAgainst]] applies it map-side — so the same
  * trained profile also flags a STREAM (stream-static broadcast join,
  * stateless: the online leg, q126) or tomorrow's batch against today's
  * profile.
  *
  * [[Percentiles.Mode.Exact]] uses Spark's interpolated `percentile`
  * (per-group value buffer — the q36-gated exact leg); at 100 TB route
  * [[Percentiles.Mode.Sketch]]: both medians become GK sketches with
  * bounded state and map-side partial merge, at the documented rank-error
  * cost (the q51 contract).
  */
object Outliers {

  private def med(mode: Percentiles.Mode)(c: Column): Column = mode match {
    case Percentiles.Mode.Exact => percentile(c, lit(0.5))
    case Percentiles.Mode.Sketch(acc) => percentile_approx(c, lit(0.5), lit(acc))
  }

  /** The trained profile: one row per group with `(group_median,
    * group_mad)`. Two grouped aggregations; the first's bounded result is
    * broadcast back for the deviation pass.
    */
  def stats(df: DataFrame, groupCol: String, valueCol: String,
            mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame = {
    val m = med(mode) _
    val rows = df.where(col(valueCol).isNotNull)
    val m1 = rows
      .groupBy(col(groupCol).as("__graft_out_g"))
      .agg(m(col(valueCol)).as("group_median"))
    val withMed = rows
      .join(broadcast(m1), col(groupCol) <=> col("__graft_out_g"))
    val m2 = withMed
      .groupBy(col(groupCol).as("__graft_out_g2"))
      .agg(m(abs(col(valueCol) - col("group_median"))).as("group_mad"))
    m1.join(broadcast(m2), col("__graft_out_g") <=> col("__graft_out_g2"))
      .select(col("__graft_out_g").as(groupCol),
        col("group_median"), col("group_mad"))
  }

  /** Apply a trained profile to rows (batch OR stream): broadcast join +
    * map-side flag, stateless. A group whose MAD is 0 (over half the
    * values identical) flags only rows strictly away from the median —
    * the right degenerate reading: everything off the majority value is
    * anomalous.
    */
  def flagAgainst(df: DataFrame, profile: DataFrame, groupCol: String,
                  valueCol: String, z: Double = 3.0): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    df.where(col(valueCol).isNotNull)
      .join(broadcast(profile.withColumnRenamed(groupCol, "__graft_out_s")),
        col(groupCol) <=> col("__graft_out_s"))
      .drop("__graft_out_s")
      .withColumn("is_outlier",
        abs(col(valueCol) - col("group_median")) > lit(z) * col("group_mad"))
  }

  /** Train-and-apply on the same frame: all input rows (null-value rows
    * dropped) plus (group_median, group_mad, is_outlier).
    */
  def robustFlags(df: DataFrame, groupCol: String, valueCol: String,
                  z: Double = 3.0,
                  mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame =
    flagAgainst(df, stats(df, groupCol, valueCol, mode), groupCol, valueCol, z)
}
