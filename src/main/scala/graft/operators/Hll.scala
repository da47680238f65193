package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** HyperLogLog distinct-count sketch (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm", AofA 2007)
  * — the missing member of the engine's sketch family (CMS = frequency,
  * Misra-Gries = heavy hitters, GK = quantiles, Bloom = membership; HLL =
  * cardinality). Distinct-counting is THE 100 TB aggregate: exact
  * count(DISTINCT) shuffles every distinct value; the HLL leg shuffles at
  * most `m` = 64 registers per group, map-side combinable (max is
  * mergeable), a constant independent of cardinality.
  *
  * Deliberately engine-portable, like every gated sketch here:
  *  - hash = top 60 bits of md5 (the [[graft.functions.SimHash60]] trick:
  *    15 hex chars fit a signed 64-bit in both engines);
  *  - bucket = top 6 bits, rho = leading-zero rank of the remaining 54
  *    bits + 1 (a comparison ladder against powers of two — exact integer
  *    arithmetic, no floating point, no engine clz builtin);
  *  - the harmonic sum folds IN BUCKET ORDER over terms `1.0 / (1 << reg)`
  *    (each term an exact power of two, each partial sum rounded
  *    identically on both engines — the cosSql fold rule);
  *  - alpha_64 is pinned to the literal 0.709 on both sides; the raw
  *    estimator is reported without the small-range linear-counting branch
  *    (which would drag `log` libm ulps into the gate; at n >> m, the
  *    regime the sketch exists for, the branch never fires).
  */
object Hll {

  val P = 6              // 2^6 = 64 registers
  val M = 64
  val W = 54             // hash bits left after the bucket prefix
  val Alpha64 = 0.709    // pinned literal, both engines

  /** 60-bit portable hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Leading-zero rank + 1 of the low-W-bit field: 1 when the top W-bit is
    * set, W+1 when the field is all zeros. A when-ladder of integer
    * comparisons — codegen'd to a branch tree, bit-free of libm.
    */
  def rho(w: Column): Column =
    (1 to W).foldLeft(when(lit(false), lit(0))) { (acc, r) =>
      acc.when(w >= lit(1L << (W - r)), lit(r))
    }.otherwise(lit(W + 1))

  private def shl1(bits: Column): Column =
    ColumnBridge.column(ShiftLeft(ColumnBridge.expression(lit(1L)),
      ColumnBridge.expression(bits)))

  /** Sparse register table: one `(groupCols..., bucket, reg)` row per
    * NON-EMPTY register. This is the sketch STATE, and it is max-mergeable
    * on (group, bucket) — which makes it incrementally maintainable as a
    * streaming accumulate (q161) and unionable across shards/engines.
    */
  def registers(df: DataFrame, groupCols: Seq[String],
                valueCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val h = hash60(valueCol)
    df.select((g :+ h.as("__h")): _*)
      .withColumn("bucket", shiftrightunsigned(col("__h"), W).cast("int"))
      .withColumn("__rho", rho(col("__h").bitwiseAND(lit((1L << W) - 1))))
      .groupBy((g :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("reg"))
  }

  /** Finish a (possibly merged) sparse register table into per-group
    * estimates: scatter into the dense M-vector (empty registers = 0),
    * fold the harmonic sum in bucket order, apply the pinned alpha.
    */
  def estimateFromRegisters(regs: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    regs.groupBy(g: _*)
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("reg"))))
        .as("__mp"))
      .withColumn("__regs", transform(sequence(lit(0), lit(M - 1)),
        b => coalesce(element_at(col("__mp"), b), lit(0))))
      .withColumn("__hsum", aggregate(col("__regs"), lit(0.0),
        (acc, r) => acc + lit(1.0) / shl1(r).cast("double")))
      .withColumn("hll_est", lit(Alpha64) * lit(M * M) / col("__hsum"))
      .select((g :+ col("hll_est")): _*)
  }

  /** Per-group HLL cardinality estimate of `valueCol`, with the exact
    * count(DISTINCT) riding along for calibration (at scale you run ONLY
    * the sketch leg — the exact twin is the gate's measuring stick, the
    * q96/q89 convention). Output: groupCols, n_exact, hll_est, rel_err.
    */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String],
                       valueCol: Column): DataFrame = {
    val vecs = estimateFromRegisters(registers(df, groupCols, valueCol),
      groupCols)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(valueCol).as("n_exact"))
    exact.join(vecs, groupCols)
      .withColumn("rel_err", col("hll_est") / col("n_exact"))
  }
}
