package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration: isotonic regression (PAV) over a bounded score
  * alphabet, and the reliability / expected-calibration-error readout that
  * applies a trained fit to a held-out stream.
  *
  * Why an engine needs this: every scoring family in the repo ends in a
  * threshold decision — the reference's cache hit at cosine ≥ 0.75
  * (`02_method2_manual_vector_embedding.sql:243-249`), the Fellegi-Sunter
  * match class at an integer weight, a quality gate at a heuristic score.
  * Thresholds only transfer between corpora when the score is calibrated:
  * "score s ⇒ P(match) ≈ p". Isotonic regression is the standard
  * distribution-free calibrator (monotone, no parametric link), and the
  * reliability diagram + ECE is the standard audit of a calibrated score.
  *
  * Scale design: both operators collapse the (possibly enormous) scored
  * pair stream to ONE row per distinct score in a single map-side-combined
  * aggregate — the same discipline as
  * [[EntityResolution.thresholdReport]]. Everything after that runs on the
  * alphabet-sized relation: the minimax table is |alphabet|² rows built by
  * `explode(sequence(...))` (never a nested-loop join), and the windows are
  * single-partition over the bounded alphabet, never over the pair stream.
  * The caller's contract is a bounded score alphabet (integer weights, or
  * pre-binned continuous scores — [[Binning.withEquiDepthBin]] exists for
  * exactly that).
  *
  * Float parity: the only non-integer arithmetic is (a) one
  * long→double division per pooled interval and (b) IEEE min/max over
  * those quotients — both order-free and bit-exact in any engine; the
  * ECE fold is an order-pinned left fold over the score-sorted bins
  * (the q167 `list_sum(list(... ORDER BY ...))` discipline).
  */
object Calibrate {

  /** Weighted isotonic regression of P(label | score), non-decreasing in
    * `score`, via the PAV minimax closed form
    * `fit(i) = max_{j≤i} min_{k≥i} A(j,k)` where `A(j,k)` is the pooled
    * positive rate of score bins j..k (Robertson & Wright; equivalent to
    * pool-adjacent-violators, but expressible as pure relational algebra
    * over the bin table instead of a sequential driver loop).
    *
    * Output: one row per distinct score — `(score, n, pos, rate, fit)`
    * with `rate = pos/n` (the raw, possibly non-monotone empirical rate)
    * and `fit` the isotonic estimate. `label` must be a boolean Column
    * over `df`'s rows.
    *
    * The bounded-alphabet contract is ENFORCED, not assumed: the distinct
    * score count is checked against `maxAlphabet` on the aggregate's ONE
    * readout (the per-score relation lands on the driver, limit-bounded to
    * `maxAlphabet + 1` rows so a violating caller never ships more than
    * that off the cluster), so a caller passing an unbinned continuous
    * score fails loudly with a pointer at [[Binning.withEquiDepthBin]]
    * instead of silently exploding a quadratic onto one partition. The
    * guard costs nothing extra: the corpus-sized groupBy runs exactly once
    * and everything after — the |alphabet|² PAV table, the windows — runs
    * over the collected alphabet as a local relation.
    */
  def isotonicFit(df: DataFrame, scoreCol: String, label: Column,
                  maxAlphabet: Int = 4096): DataFrame = {
    val per = df.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("pos"))
    val perRows = per.limit(maxAlphabet + 1).collect()
    require(perRows.length <= maxAlphabet,
      s"isotonicFit: more than $maxAlphabet distinct '$scoreCol' values — " +
        "the |alphabet|^2 PAV table and its single-partition windows need a " +
        "bounded score alphabet; bin continuous scores first " +
        "(Binning.withEquiDepthBin) or raise maxAlphabet deliberately")
    // bounded-alphabet relation (guard-proven <= maxAlphabet rows, already
    // on the driver): global windows are single-partition by construction
    // and stay so at any corpus size
    val perLocal = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(perRows: _*), per.schema)
    val w = Window.orderBy(col(scoreCol))
    val bins = perLocal.select(col(scoreCol), col("n"), col("pos"),
      row_number().over(w).as("__idx"),
      sum("n").over(w).as("__cn"),
      sum("pos").over(w).as("__cp"))
    // all (j ≤ k) interval endpoints by exploding 1..k — |alphabet|² rows,
    // no join participates in the enumeration
    val pairs = bins.select(col("__idx").as("__k"),
        col("__cn").as("__cnk"), col("__cp").as("__cpk"))
      .withColumn("__j", explode(sequence(lit(1L), col("__k"))))
    val prefix = bins.select((col("__idx") + 1L).as("__j"),
      col("__cn").as("__cnj"), col("__cp").as("__cpj"))
    val pooled = pairs.join(broadcast(prefix), Seq("__j"), "left")
      .withColumn("__a",
        (col("__cpk") - coalesce(col("__cpj"), lit(0L))).cast("double") /
          (col("__cnk") - coalesce(col("__cnj"), lit(0L))).cast("double"))
    // min over right endpoints k' ≥ k within a fixed left endpoint j …
    val sm = Window.partitionBy("__j").orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // … then max over left endpoints j ≤ i (rows keyed __k=i carry exactly
    // the j ≤ i suffix minima)
    val fit = pooled.withColumn("__m", min("__a").over(sm))
      .groupBy(col("__k")).agg(max("__m").as("fit"))
    bins.join(broadcast(fit), col("__idx") === col("__k"))
      .select(col(scoreCol), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        col("fit"))
  }

  /** Reliability diagram + ECE: apply a trained isotonic `fitTable`
    * (`(score, fit)` — [[isotonicFit]] output) to a held-out stream.
    *
    * The fit is a step function, so an eval score unseen in training maps
    * to the fit of the greatest trained score ≤ it (carry-forward; eval
    * scores below every trained score get a null `conf` and weight 0 in
    * the ECE). Output: one row per eval score bin —
    * `(score, n_eval, pos_eval, acc, conf, gap, ece)` where
    * `gap = conf − acc` and `ece = Σ n·|gap| / N` (constant column; the
    * Σ is an order-pinned fold over score-sorted bins).
    *
    * Denominator choice, stated explicitly: `N = Σ n_eval` over ALL eval
    * bins, INCLUDING null-conf bins below the trained alphabet whose
    * numerator weight is 0 — so ECE reads as "calibration error of the
    * covered mass, amortized over the whole eval stream", and an eval set
    * extending far below the trained alphabet DEFLATES the scalar. That
    * uncovered mass is auditable in the output itself (rows with null
    * `conf` and their `n_eval`); a caller wanting covered-only ECE filters
    * `conf IS NOT NULL` before reading the fold, or treats large
    * uncovered mass as a reason to refit on wider training data.
    */
  def reliability(eval: DataFrame, scoreCol: String, label: Column,
                  fitTable: DataFrame): DataFrame = {
    val per = eval.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(label, 1L).otherwise(0L)).as("pos_eval"))
    val f = fitTable.select(col(scoreCol), col("fit"))
    // union + carry-forward over the bounded score alphabet: the as-of
    // (backward) application of a step function, AsOf.join's shape
    val merged = per.join(f, Seq(scoreCol), "full_outer")
    val wf = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val applied = merged
      .withColumn("conf", last(col("fit"), ignoreNulls = true).over(wf))
      .where(col("n_eval").isNotNull)
      .withColumn("acc",
        col("pos_eval").cast("double") / col("n_eval").cast("double"))
      .withColumn("gap", col("conf") - col("acc"))
      .withColumn("__w", when(col("conf").isNull, lit(0.0))
        .otherwise(col("n_eval").cast("double") * abs(col("gap"))))
    // ECE as a full-frame window over the same bounded relation (a 1-row
    // cross join back would plan a nested-loop join for no reason)
    val wAll = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    applied
      .withColumn("ece",
        aggregate(
          sort_array(collect_list(struct(col(scoreCol), col("__w"))).over(wAll)),
          lit(0.0), (acc, x) => acc + x.getField("__w")) /
          sum("n_eval").over(wAll).cast("double"))
      .select(col(scoreCol), col("n_eval"), col("pos_eval"),
        col("acc"), col("conf"), col("gap"), col("ece"))
  }
}
