package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization: clip a numeric column to its group's
  * [pLo, pHi] percentile band — the standard tail-taming step before
  * training on raw telemetry (a handful of sensor glitches otherwise own
  * every mean, loss, and normalization constant downstream). Unlike the
  * [[Outliers]] flags this KEEPS every row, replacing extremes with the
  * band edge.
  *
  * Plan shape is the Gate/[[Outliers]] two-pass form: one grouped
  * percentile aggregation over bounded-cardinality groups, its small
  * result broadcast back onto the row stream, the clip itself map-side —
  * the row stream never shuffles. [[Percentiles.Mode.Exact]] buffers
  * per-group values (the q36 leg, gate-exact); at 100 TB route
  * [[Percentiles.Mode.Sketch]] — GK sketches with map-side partial merge,
  * the q51 contract.
  */
object Winsorize {

  /** Input rows (null values dropped) plus the group band and the clipped
    * value. Band columns are named by [[Percentiles]] convention
    * (`p5`/`p95` for the defaults).
    */
  def clipped(df: DataFrame, groupCol: String, valueCol: String,
              pLo: Double = 0.05, pHi: Double = 0.95,
              mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame = {
    require(pLo < pHi, s"pLo must be below pHi, got [$pLo, $pHi]")
    val rows = df.where(col(valueCol).isNotNull)
    val band = Percentiles.grouped(rows, Seq(groupCol), valueCol,
        Seq(pLo, pHi), mode)
      .withColumnRenamed(groupCol, "__graft_w_g").drop("n")
    val Seq(lo, hi) = Seq(pLo, pHi).map(Percentiles.bandColName)
    rows.join(broadcast(band), col(groupCol) <=> col("__graft_w_g"))
      .drop("__graft_w_g")
      .withColumn("v_clipped",
        least(greatest(col(valueCol), col(lo)), col(hi)))
  }
}
