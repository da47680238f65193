package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DetMath

/** Differentially-private release — the third rung of the governance
  * ladder ([[Pii]] strips direct identifiers, [[Anonymity]] audits and
  * recodes quasi-identifiers, this bounds what ANY query output reveals
  * about ANY single row): per-group counts with Laplace(1/ε) noise via
  * the inverse CDF,
  *
  *   noise = sgn(u − 1/2) · (1/ε) · ln(1 / (1 − 2|u − 1/2|))
  *
  * Every step is deterministic AND bit-portable across engines:
  *   - u is the md5 hash-uniform of the group key
  *     ([[Sampling.uniformFromId]] — k/2^32, exact in double), so a
  *     re-run releases the SAME noise for the same group (fresh noise
  *     per release would let an observer average it away — determinism
  *     here is a privacy requirement, not just an engineering one; vary
  *     `salt` per release epoch to spend more budget deliberately);
  *   - u − 1/2, 2|d|, and 1 − 2|d| are EXACT (all multiples of 2^−31
  *     with no rounding), so w needs no epsilon fudge;
  *   - the ln runs through [[DetMath.withLnDet]] on the reciprocal
  *     (1/w ≥ 1 — inside the series' domain), the same pinned
  *     atanh-series both engines replay bit-for-bit;
  *   - w is floored at 2^−32 so the u = 0 lattice point yields the
  *     distribution's finite tail max (≈ 22.18/ε), not ±∞.
  *
  * Scale shape: ONE hash aggregation for the counts, then pure map-side
  * column math on the |groups|-row relation — the noise machinery never
  * touches the row stream.
  */
object Privacy {

  /** 2^−32 — the w clamp; exactly representable. */
  val WFloor: Double = java.lang.Math.scalb(1.0, -32)

  /** ε-DP noisy per-group counts (count sensitivity = 1). Output keeps
    * the true `n` and the `noise` for auditability — a production
    * release projects them away and ships `noisy_n`/`released_n` only.
    *
    * SECURITY CONTRACT — the `salt` is the mechanism's SECRET KEY, not a
    * tweak: noise = f(group key, salt) with f public, so anyone who
    * knows the salt recomputes the noise and subtracts it, recovering
    * the exact count. The ε-DP guarantee holds ONLY against observers
    * who do not know the salt. A real release must draw it per release
    * epoch from a high-entropy secret source (≥128 bits) and manage it
    * like a credential (never in source control or query text); rotate
    * it to deliberately spend fresh budget. There is deliberately no
    * default — a code-visible constant salt (as this repo's oracle
    * DEMOS use, where both engines must replay identical noise) yields
    * a reproducible mechanism DEMO, not a private release.
    */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
                  salt: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    require(salt.nonEmpty, "salt is the DP mechanism's secret key — required")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val staged = counts
      .withColumn("__u", Sampling.uniformFromId(key, salt))
      .withColumn("__w", greatest(
        lit(1.0) - lit(2.0) * abs(col("__u") - lit(0.5)), lit(WFloor)))
      .withColumn("__winv", lit(1.0) / col("__w"))
    DetMath.withLnDet(staged, "__winv", "__lnw")
      .withColumn("noise",
        when(col("__u") >= lit(0.5), lit(1.0)).otherwise(lit(-1.0)) *
          (lit(1.0) / lit(epsilon)) * col("__lnw"))
      .withColumn("noisy_n", col("n").cast("double") + col("noise"))
      .withColumn("released_n",
        greatest(round(col("noisy_n")).cast("long"), lit(0L)))
      .drop("__u", "__w", "__winv", "__lnw")
  }
}
