package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding — the categorical-feature workhorse of
  * tabular ML pipelines: replace a high-cardinality category with the
  * mean of the target over the OTHER rows of the same category. The
  * leave-one-out form is the leakage control (the q115 lesson applied
  * to feature engineering): a row's own target never reaches its own
  * feature, so the encoding can be computed on the training table
  * itself without a fold split.
  *
  * enc(row) = (Σ_cat target − target_row) / (n_cat − 1), computed from
  * ONE bounded per-category aggregate (sum, count — map-side partials)
  * joined back to the rows; singleton categories encode null (no other
  * row exists — an honest absence, callers impute globally if they
  * must). The target arrives as exact integer units (cents), so the
  * numerator and denominator are exact integers and the encoding is
  * the single correctly-rounded division both engines share.
  */
object TargetEncode {

  /** Append `outCol`: the LOO mean of integer `targetCol` within
    * `catCol`. Rows with a null category or target are passed through
    * with a null encoding (they contribute to no category).
    */
  def looMean(df: DataFrame, catCol: String, targetCol: String,
              outCol: String): DataFrame = {
    val stats = df
      .where(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__s"), count(lit(1)).as("__n"))
    // no broadcast HINT: target encoding exists for HIGH-cardinality
    // categories, where the stats side can be arbitrarily wide — AQE
    // broadcasts when the aggregate turns out small, shuffles when not
    df.join(stats, Seq(catCol), "left")
      .withColumn(outCol,
        when(col(targetCol).isNotNull && col("__n") > 1,
          (col("__s") - col(targetCol)).cast("double") /
            (col("__n") - 1).cast("double")))
      .drop("__s", "__n")
  }
}
