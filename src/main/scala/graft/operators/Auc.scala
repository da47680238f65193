package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC via the Mann–Whitney U statistic — the
  * classification-side evaluator next to [[Eval]]'s ranking metrics
  * (recall/MRR/nDCG grade retrieval; AUC grades any scalar scorer —
  * quality classifiers, LTR features, dedup thresholds — against a
  * binary label):
  *
  *   AUC = [Σ_pos midrank − n⁺(n⁺+1)/2] / (n⁺ n⁻)
  *
  * with MIDRANKS for tied scores (the tie-aware form — ignoring ties
  * biases AUC toward whichever class happens to sort first, i.e. an
  * engine-accident answer). Everything is integer until one final
  * divide: the score DICTIONARY (distinct score → count, positives)
  * carries rank arithmetic as 2·midrank = 2·cum_before + cnt + 1
  * (always integral), so U·2 is an exact integer and
  * AUC = U2 / (2 n⁺ n⁻) is a single correctly-rounded division.
  *
  * Scale shape: one hash agg to the dictionary, one in-group ordered
  * pass OVER THE DICTIONARY (bounded by distinct scores, not rows),
  * one bounded rollup. No per-pair work — the U identity is exactly
  * what makes n⁺·n⁻ pair comparisons unnecessary. Degenerate groups
  * (a class absent) report a null AUC, not a coin flip.
  */
object Auc {

  /** Per-group exact AUC of `scoreCol` predicting boolean `labelCol`.
    * Output: (group, n_pos, n_neg, auc).
    */
  def groupedAuc(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: Column): DataFrame = {
    val dict = df
      .where(col(groupCol).isNotNull && col(scoreCol).isNotNull &&
        labelCol.isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(labelCol, 1L).otherwise(0L)).as("np"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = dict
      .withColumn("__cb", sum(col("cnt")).over(w) - col("cnt"))
      .withColumn("__mr2", lit(2L) * col("__cb") + col("cnt") + lit(1L))
    ranked.groupBy(col(groupCol))
      .agg(sum(col("np")).as("n_pos"),
        sum(col("cnt") - col("np")).as("n_neg"),
        sum(col("np") * col("__mr2")).as("__smr2"))
      .withColumn("auc",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          (col("__smr2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .drop("__smr2")
  }
}
