package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Deng, Xu, Kohavi, Walker — WSDM 2013):
  * the standard industrial upgrade to [[AbTest]]. A pre-experiment
  * covariate x correlated with the metric y absorbs between-user
  * variance: with θ = cov(x,y)/var(x) (pooled across arms — θ is a
  * constant, so it cannot bias the treatment contrast),
  * ỹ = y − θ·x has var(ỹ) = var(y)(1 − ρ²), and the same Welch z on
  * ỹ detects smaller lifts with the same data.
  *
  * The whole readout derives from ONE pass of integer moments per
  * (group, arm) — n, Σx, Σy, Σxy, Σx², Σy² — because every adjusted
  * quantity is algebra over them:
  *
  *   Σỹ  = Σy − θΣx,   Σỹ² = Σy² − 2θΣxy + θ²Σx²
  *
  * No second pass over the data, no materialized ỹ column; after the
  * agg everything is a pinned double chain ending in the IEEE sqrt
  * (bit-portable, no transcendentals). The report carries both the
  * raw z and the CUPED z plus the measured variance ratio, so the
  * reader sees what the covariate actually bought.
  */
object Cuped {

  /** `x`/`y` integral pre-period / experiment metrics, one row per
    * unit; `armCol` 0/1. Output per group: ns, theta, raw and CUPED
    * z, and the pooled adjusted-to-raw variance ratio.
    */
  def readout(df: DataFrame, groupCol: String, armCol: Column,
              xCol: String, yCol: String,
              zCrit: Double = 1.96): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    def arm(a: Int, e: Column): Column =
      sum(when(armCol === lit(a), e).otherwise(lit(0L)))
    val agg = df
      .where(col(groupCol).isNotNull && x.isNotNull && y.isNotNull &&
        armCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        arm(0, lit(1L)).as("n_a"), arm(1, lit(1L)).as("n_b"),
        arm(0, x).as("sx_a"), arm(1, x).as("sx_b"),
        arm(0, y).as("sy_a"), arm(1, y).as("sy_b"),
        arm(0, x * y).as("sxy_a"), arm(1, x * y).as("sxy_b"),
        arm(0, x * x).as("sxx_a"), arm(1, x * x).as("sxx_b"),
        arm(0, y * y).as("syy_a"), arm(1, y * y).as("syy_b"))
    def D(c: Column): Column = c.cast("double")
    val n = D(col("n_a")) + D(col("n_b"))
    val sx = D(col("sx_a")) + D(col("sx_b"))
    val sy = D(col("sy_a")) + D(col("sy_b"))
    val sxy = D(col("sxy_a")) + D(col("sxy_b"))
    val sxx = D(col("sxx_a")) + D(col("sxx_b"))
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    // per-arm mean/variance of a metric given (n, s1, s2)
    def mean(s1: Column, nn: Column): Column = s1 / nn
    def vr(s2: Column, s1: Column, nn: Column): Column =
      (s2 - s1 * s1 / nn) / (nn - lit(1.0))
    // adjusted first/second moments from the raw ones
    def adj1(syc: Column, sxc: Column, th: Column): Column = syc - th * sxc
    def adj2(syyc: Column, sxyc: Column, sxxc: Column, th: Column): Column =
      syyc - lit(2.0) * th * sxyc + th * th * sxxc

    val withTheta = agg.withColumn("theta", theta)
    val na = D(col("n_a"))
    val nb = D(col("n_b"))
    def z(s1a: Column, s2a: Column, s1b: Column, s2b: Column): Column =
      (mean(s1b, nb) - mean(s1a, na)) /
        sqrt(vr(s2a, s1a, na) / na + vr(s2b, s1b, nb) / nb)
    val th = col("theta")
    val rawZ = z(D(col("sy_a")), D(col("syy_a")),
      D(col("sy_b")), D(col("syy_b")))
    val cupedZ = z(
      adj1(D(col("sy_a")), D(col("sx_a")), th),
      adj2(D(col("syy_a")), D(col("sxy_a")), D(col("sxx_a")), th),
      adj1(D(col("sy_b")), D(col("sx_b")), th),
      adj2(D(col("syy_b")), D(col("sxy_b")), D(col("sxx_b")), th))
    val varRatio =
      (adj2(D(col("syy_a")), D(col("sxy_a")), D(col("sxx_a")), th) +
        adj2(D(col("syy_b")), D(col("sxy_b")), D(col("sxx_b")), th) -
        (adj1(D(col("sy_a")), D(col("sx_a")), th) *
          adj1(D(col("sy_a")), D(col("sx_a")), th) / na +
          adj1(D(col("sy_b")), D(col("sx_b")), th) *
            adj1(D(col("sy_b")), D(col("sx_b")), th) / nb)) /
        (D(col("syy_a")) + D(col("syy_b")) -
          (D(col("sy_a")) * D(col("sy_a")) / na +
            D(col("sy_b")) * D(col("sy_b")) / nb))

    withTheta
      .withColumn("z_raw",
        when(col("n_a") > 1 && col("n_b") > 1, rawZ))
      .withColumn("z_cuped",
        when(col("n_a") > 1 && col("n_b") > 1, cupedZ))
      .withColumn("var_ratio",
        when(col("n_a") > 1 && col("n_b") > 1, varRatio))
      .withColumn("significant",
        when(col("z_cuped").isNotNull, abs(col("z_cuped")) > lit(zCrit)))
      .select(groupCol, "n_a", "n_b", "theta", "z_raw", "z_cuped",
        "var_ratio", "significant")
  }
}
