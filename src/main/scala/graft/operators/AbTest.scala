package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout — Welch's unequal-variance z-test per metric
  * group, built back-to-front from exact integer moments so the
  * verdict is reproducible to the bit:
  *
  *   - ONE conditional aggregation collects (n, Σx, Σx²) per
  *     (group, arm) — integer sums, map-side partials, order-free;
  *   - mean, variance ((Σx² − (Σx)²/n)/(n−1)), the pooled standard
  *     error and z = (m_a − m_b)/se are a fixed sequence of
  *     correctly-rounded double ops (+ − × ÷ and `sqrt` — all IEEE
  *     correctly rounded, no transcendentals), identical on every
  *     engine;
  *   - the verdict |z| > z_crit is a double comparison of those bits.
  *
  * Sample-size guard: arms with n ≤ 1 have no variance estimate — z
  * and the verdict are null, not NaN (an underpowered readout is an
  * explicit non-answer, not a coin flip).
  *
  * Scale shape: the row stream is touched exactly once by the
  * conditional agg; everything after runs on |groups| rows. Integer
  * headroom: Σx² stays below 2^63 while n·max(x)² does — at cents
  * scale that is ~10^5 rows of 10^7-cent values per (group, arm)
  * times a billion; re-scale units before this overflows.
  */
object AbTest {

  /** `armCol` must be 0 (control, "a") / 1 (treatment, "b");
    * `valueCol` integral. Output per group: ns, means, z, significant.
    */
  def welchReadout(df: DataFrame, groupCol: String, armCol: Column,
                   valueCol: String, zCrit: Double = 1.96): DataFrame = {
    def side(arm: Int, e: Column): Column =
      sum(when(armCol === lit(arm), e).otherwise(lit(0L)))
    val x = col(valueCol)
    val agg = df
      .where(col(groupCol).isNotNull && x.isNotNull && armCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        side(0, lit(1L)).as("n_a"), side(1, lit(1L)).as("n_b"),
        side(0, x).as("s1_a"), side(1, x).as("s1_b"),
        side(0, x * x).as("s2_a"), side(1, x * x).as("s2_b"))
    def mean(s1: String, n: String): Column =
      col(s1).cast("double") / col(n).cast("double")
    def variance(s2: String, s1: String, n: String): Column =
      (col(s2).cast("double") -
        col(s1).cast("double") * col(s1).cast("double") /
          col(n).cast("double")) /
        (col(n) - lit(1L)).cast("double")
    val withM = agg
      .withColumn("mean_a", mean("s1_a", "n_a"))
      .withColumn("mean_b", mean("s1_b", "n_b"))
      .withColumn("__va", variance("s2_a", "s1_a", "n_a"))
      .withColumn("__vb", variance("s2_b", "s1_b", "n_b"))
    val z = (col("mean_b") - col("mean_a")) /
      sqrt(col("__va") / col("n_a").cast("double") +
        col("__vb") / col("n_b").cast("double"))
    withM
      .withColumn("z", when(col("n_a") > 1 && col("n_b") > 1, z))
      .withColumn("significant",
        when(col("z").isNotNull, abs(col("z")) > lit(zCrit)))
      .select(groupCol, "n_a", "n_b", "mean_a", "mean_b", "z",
        "significant")
  }
}
