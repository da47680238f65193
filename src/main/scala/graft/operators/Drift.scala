package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sample distribution drift over a fixed evaluation grid — the
  * FEATURE-drift monitor of the maintenance family ([[IndexDrift]]
  * watches embedding geometry; this watches scalar feature
  * distributions): did this week's `value` distribution move away from
  * last week's, per group? The statistic is the Kolmogorov-Smirnov
  * max-CDF-gap discretized to caller-chosen grid points, which trades
  * the order statistics a streaming system can't afford for a
  * fixed-size sufficient summary: per (group, side), ONE aggregation
  * pass computes n and a cumulative count per grid point as conditional
  * codegen sums — no sort, no explode, map-side partials, state
  * |groups| × |grid| integers (and therefore trivially sum-mergeable
  * into the streaming-accumulate family).
  *
  * Everything stays exact: the max gap is maximized over
  * |c_a·n_b − c_b·n_a| (integer cross-products — max over integers is
  * order-free), the drift verdict compares against the rational
  * threshold tauP/tauQ by cross-multiplication, and the reported `ks`
  * is the single correctly-rounded division max_d / (n_a·n_b).
  *
  * Groups must appear in BOTH samples to be judged (inner join —
  * appearing/vanishing groups are a schema-level alarm, not a KS
  * question).
  */
object Drift {

  def ksDrift(a: DataFrame, b: DataFrame, groupCol: String, valueCol: String,
              cuts: Seq[Double], tauP: Long, tauQ: Long): DataFrame =
    verdict(summarize(a, groupCol, valueCol, cuts),
      summarize(b, groupCol, valueCol, cuts), groupCol, cuts, tauP, tauQ)

  /** The fixed-size sufficient summary: per group, `n` and one
    * cumulative count per grid point (`c0..cK`). All plain sums —
    * SUM-MERGEABLE across arbitrary slicings, which is what makes the
    * streaming accumulate exact.
    */
  def summarize(df: DataFrame, groupCol: String, valueCol: String,
                cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "at least one grid point")
    val aggs = count(lit(1)).as("n") +: cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col(valueCol) <= c, 1L).otherwise(0L)).as(s"c$i")
    }
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The KS verdict from two summaries (as produced by [[summarize]]
    * over the same `cuts`).
    */
  def verdict(sa: DataFrame, sb: DataFrame, groupCol: String,
              cuts: Seq[Double], tauP: Long, tauQ: Long): DataFrame = {
    require(tauQ > 0 && tauP >= 0, s"threshold $tauP/$tauQ")
    def sfx(df: DataFrame, s: String): DataFrame =
      (Seq("n") ++ cuts.indices.map(i => s"c$i")).foldLeft(df)(
        (d, c) => d.withColumnRenamed(c, s"$c$s"))
    val joined = sfx(sa, "_a").join(sfx(sb, "_b"), Seq(groupCol))
    val diffs = cuts.indices.map(i =>
      abs(col(s"c${i}_a") * col("n_b") - col(s"c${i}_b") * col("n_a")))
    val maxD = if (diffs.size == 1) diffs.head else greatest(diffs: _*)
    joined
      .withColumn("max_d", maxD)
      .select(col(groupCol), col("n_a"), col("n_b"), col("max_d"),
        (col("max_d").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("ks"),
        (col("max_d") * tauQ > lit(tauP) * col("n_a") * col("n_b")).as("drift"))
  }
}
