package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-dimension standardization of an embedding column — the
  * feature-scaling pass before distance-based work (ANN, clustering,
  * cosine near-dup) when dimensions carry wildly different spreads.
  *
  * Median/IQR instead of mean/stddev, deliberately: medians are ORDER
  * STATISTICS — selected (or midpoint-interpolated) data values, so the
  * result is independent of aggregation order and bit-reproducible across
  * engines and partitionings. A mean is a summation whose float rounding
  * depends on reduction order — unreproducible at scale and skewed by the
  * very outliers a scaler should resist (the [[Outliers]] argument).
  *
  * Output is LONG form `(id, dim, z)` — the shape downstream per-dimension
  * work (histograms, per-dim clipping, sparse encodings) consumes without
  * re-exploding, and the shape that gates cleanly (no array rebuild).
  *
  * Scale: one posexplode (rows × dim, map-side) into one grouped
  * aggregation over exactly `dim` groups, whose `dim`-row result
  * broadcasts back onto the long stream — the data never shuffles.
  * `dim` groups over many partitions is the skew case for the Exact leg
  * (per-group value buffers); at 100 TB route
  * [[Percentiles.Mode.Sketch]] — GK partials merge map-side, so group
  * size stops mattering (the q51 contract).
  */
object FeatureScale {

  /** `(idCol, dim, z)` with `z = (v - p50) / iqr` per dimension
    * (`iqr = p75 - p25`; a zero IQR — over half the dimension identical —
    * divides by 1, leaving centered-but-unscaled values rather than NaN).
    * Null embeddings are dropped; elements are cast to double before any
    * arithmetic so float inputs scale without surprise promotion.
    */
  def robustScaleLong(df: DataFrame, idCol: String, embCol: String,
                      mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame = {
    val long = df.where(col(embCol).isNotNull)
      .select(col(idCol), posexplode(col(embCol)))
      .select(col(idCol), col("pos").as("dim"),
        col("col").cast("double").as("v"))
    val stats = Percentiles.grouped(long, Seq("dim"), "v",
        Seq(0.25, 0.5, 0.75), mode)
      .withColumnRenamed("dim", "__graft_fs_d")
    val iqr = col(Percentiles.bandColName(0.75)) - col(Percentiles.bandColName(0.25))
    long.join(broadcast(stats), col("dim") === col("__graft_fs_d"))
      .withColumn("z",
        (col("v") - col(Percentiles.bandColName(0.5))) /
          when(iqr === 0d, lit(1.0)).otherwise(iqr))
      .select(col(idCol), col("dim"), col("z"))
  }
}
