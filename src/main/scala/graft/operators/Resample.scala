package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: project each key's irregular event stream onto a
  * regular time grid (step-aligned, spanning the key's own [min, max]
  * range) and forward-fill the last observation at or before each grid
  * point — the gap-filling every downstream window/feature computation
  * assumes ("as-of the hour, what was the sensor's value").
  *
  * Deterministic by construction: same-timestamp events collapse FIRST
  * (max value per (key, ts) — a declared tie rule, not an engine accident),
  * then one union + carry-forward window per key produces the fill. The
  * per-key window partition holds that key's events + grid points —
  * bounded by activity span / step, never the corpus (the q33 sessionize
  * argument) — and the grid explode is `sequence()` inside the scan stage.
  * Grid points before a key's first observation keep a null value (no
  * fabrication before the first fact).
  */
object Resample {

  /** Forward-fill `valueCol` onto a `stepMinutes` grid per `keyCol`.
    * Output: (keyCol, grid_ts, value) — `value` null before the key's
    * first observation. Grid start = key's min ts floored to the step;
    * grid end = the key's max ts.
    */
  def ffillGrid(df: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, stepMinutes: Int): DataFrame = {
    require(stepMinutes > 0, "stepMinutes must be positive")
    val stepUs = stepMinutes.toLong * 60L * 1000000L
    // declared tie rule: simultaneous observations collapse to their max
    val ev = df
      .where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol).as("__ts"))
      .agg(max(col(valueCol)).as("__v"))
    val grid = ev.groupBy(col(keyCol))
      .agg(min(col("__ts")).as("__mn"), max(col("__ts")).as("__mx"))
      .select(col(keyCol), explode(sequence(
        // floor-to-step in pure INTEGER arithmetic (a - a mod step): a
        // double division would round near boundaries
        timestamp_micros(
          unix_micros(col("__mn")) - pmod(unix_micros(col("__mn")), lit(stepUs))),
        col("__mx"),
        expr(s"INTERVAL $stepMinutes MINUTES"))).as("__ts"))
      .withColumn("__v", lit(null).cast(ev.schema("__v").dataType))
      .withColumn("__is_grid", lit(1))
    val w = Window
      .partitionBy(col(keyCol))
      // grid point AFTER the same-instant event: an observation exactly on
      // the grid IS visible at that grid point
      .orderBy(col("__ts"), col("__is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__is_grid", lit(0))
      .unionByName(grid)
      .withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__is_grid") === 1)
      .select(col(keyCol), col("__ts").as("grid_ts"),
        col("__fill").as(valueCol))
  }
}
