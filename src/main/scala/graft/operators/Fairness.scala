package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Disparate-impact audit — the fairness leg of the governance family
  * ([[Anonymity]] asks what a release reveals, [[Privacy]] bounds it;
  * this asks whether an automated DECISION — a quality gate, a
  * sampling policy, a ranking cutoff — lands evenly across groups):
  * per group, the positive rate vs the rest-of-population rate, the
  * disparate-impact ratio, and the four-fifths-rule verdict
  * (EEOC 29 CFR §1607.4(D): selection rate < 4/5 of the comparison
  * group's is evidence of adverse impact).
  *
  * Each group compares against ALL OTHER groups (not the pool
  * including itself, which dilutes the very effect being measured) —
  * rest-rates come from the group's own counts subtracted from the
  * broadcast totals, so the whole audit is ONE aggregation plus
  * column math. The 4/5 verdict is an exact integer
  * cross-multiplication (5·pos_g·n_rest < 4·pos_rest·n_g); the
  * reported rates and ratio are single correctly-rounded divisions.
  * Groups where either side has no population report null ratios.
  */
object Fairness {

  /** Output per group: n, pos, rate, rest_rate, di_ratio, adverse. */
  def disparateImpact(df: DataFrame, groupCol: String,
                      positive: Column): DataFrame = {
    val g = df.where(col(groupCol).isNotNull && positive.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(positive, 1L).otherwise(0L)).as("pos"))
    val tot = g.agg(sum("n").as("__tn"), sum("pos").as("__tp"))
    val joined = g.crossJoin(broadcast(tot))
      .withColumn("__rn", col("__tn") - col("n"))
      .withColumn("__rp", col("__tp") - col("pos"))
    joined
      .withColumn("rate", col("pos").cast("double") / col("n").cast("double"))
      .withColumn("rest_rate",
        when(col("__rn") > 0L,
          col("__rp").cast("double") / col("__rn").cast("double")))
      .withColumn("di_ratio",
        when(col("__rn") > 0L && col("__rp") > 0L,
          (col("pos") * col("__rn")).cast("double") /
            (col("__rp") * col("n")).cast("double")))
      .withColumn("adverse",
        when(col("__rn") > 0L && col("__rp") > 0L,
          lit(5L) * col("pos") * col("__rn") <
            lit(4L) * col("__rp") * col("n")))
      .select(groupCol, "n", "pos", "rate", "rest_rate", "di_ratio",
        "adverse")
  }
}
