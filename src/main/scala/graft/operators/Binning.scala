package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact equi-depth (quantile) discretization — the feature-binning
  * primitive (decision-tree inputs, calibration buckets, monotone
  * target-encoding prep), built so the ROW STREAM is never globally
  * sorted: ranks come from the VALUE DICTIONARY (one row per distinct
  * value with its count), which is the only thing ordered —
  *
  *   bin(v) = (B · c_before(v)) div n,   c_before = #rows with value < v
  *
  * all integer arithmetic, so the cut placement is exact and
  * deterministic, and every row with the same value lands in the same
  * bin BY CONSTRUCTION (ntile's tie-splitting would make the feature
  * non-reproducible row-order-dependent at redistribution time).
  * Depths are therefore equal only up to tie mass — heavy ties make
  * honest unequal bins instead of silently splitting a value.
  *
  * Scale shape: one hash agg to the dictionary, one ordered pass OVER
  * THE DICTIONARY (|distinct values| rows — the single-partition
  * window is bounded by dictionary size, not data size), one equi-join
  * back (AQE broadcasts small dictionaries). When the dictionary is
  * row-sized (continuous doubles at 100 TB), exact prefix ranks are
  * the wrong tool — use [[Percentiles.Mode.Sketch]] cuts instead.
  */
object Binning {

  /** The dictionary mapping: one row per distinct non-null value with
    * (`cnt`, `bin`). `bins` must fit in int; n·B must fit in long.
    */
  def equiDepthDict(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1: $bins")
    val dict = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    val ord = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    dict
      .withColumn("__cb", sum(col("cnt")).over(ord) - col("cnt"))
      .withColumn("__n", sum(col("cnt")).over(all))
      .withColumn("bin", expr(s"(__cb * $bins) div __n"))
      .drop("__cb", "__n")
  }

  /** Rows with their bin attached (null values get a null bin). */
  def withEquiDepthBin(df: DataFrame, valueCol: String, bins: Int,
                       outCol: String = "bin"): DataFrame = {
    val mapping = equiDepthDict(df, valueCol, bins)
      .select(col(valueCol), col("bin").as(outCol))
    df.join(mapping, Seq(valueCol), "left")
  }
}
