package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) — the cross-SOURCE identity
  * problem: two systems describe overlapping real-world entities with
  * no shared key, degraded fields, and missing values; which record
  * pairs are the same entity? The Fellegi-Sunter decision model
  * (JASA'69) in its deterministic integer form: per-field
  * agree/disagree/missing scores (the log-likelihood-ratio weights,
  * here fixed integers so every decision is bit-portable) sum to a
  * pair score, thresholded into match / possible / non-match — the
  * "possible" band is the clerical-review queue, the operational point
  * of the model.
  *
  * Scale = blocking, exactly like the dedup family: candidate pairs
  * come from an EQUI-join on `blockCols` (never A×B), so pair volume
  * is Σ_block |A_b|·|B_b| — the block key must bound block size the
  * way lang/source does for [[Dedup]] (skewed blocks get the q41
  * salting treatment). Scoring is map-side codegen arithmetic on the
  * joined row; non-matches are filtered BEFORE anything else sees the
  * pair stream, so output is collision-bounded, not pair-bounded.
  */
object EntityResolution {

  /** Score blocked A×B candidate pairs. `a` and `b` must share exactly
    * `blockCols` (same names) and keep every other column name
    * disjoint; `fieldScores` are integer Columns over the joined row
    * (the caller's agree/disagree/missing ladders). Pairs scoring below
    * `possibleMin` are dropped; `cls` is "match" at >= matchMin, else
    * "possible".
    */
  def scorePairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                 fieldScores: Seq[Column], matchMin: Long,
                 possibleMin: Long): DataFrame = {
    require(fieldScores.nonEmpty, "at least one field score")
    require(matchMin >= possibleMin, s"matchMin $matchMin < possibleMin $possibleMin")
    a.join(b, blockCols)
      .withColumn("score", fieldScores.reduce(_ + _))
      .where(col("score") >= possibleMin)
      .withColumn("cls",
        when(col("score") >= matchMin, lit("match")).otherwise(lit("possible")))
  }

  /** Banded refinement of [[scorePairs]] — acting on what
    * [[blockingAudit]] diagnoses. A coarse block key whose alphabet is
    * FIXED (25 nations) produces blocks that grow linearly with the
    * data, so the candidate pair stream grows QUADRATICALLY — the audit
    * flags every such block `oversized` and nothing can salt away a
    * quadratic pair volume (salting only re-distributes it). The fix is
    * a finer key whose alphabet grows with the VALUE RANGE, not the row
    * count: an integer band column (e.g. account balance floored to
    * dollars). A band-proximity window (|a_band − b_band| ≤ step) is
    * not an equi-join key by itself, so the b side is replicated into
    * its 3 admissible bands (band−step, band, band+step) and the join
    * stays a pure hash equi-join on `blockCols :+ band` — never a
    * range/theta join, never A×B. Each (a,b) candidate arises from
    * EXACTLY ONE replica (the 3 replica bands are distinct integers),
    * so no dedup pass is needed. Both band columns must be multiples of
    * `step` for the window to be exact (a floored-to-step value is).
    *
    * Candidate semantics: pairs farther than one band apart are not
    * scored at all — by construction the caller picks `step` to cover
    * the widest agreement window any field score awards (e.g. step=100
    * cents covers a ≤100-cent balance-agreement window exactly), so
    * every excluded pair could only have scored the field's DISAGREE
    * weight anyway.
    */
  def scorePairsBanded(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                       aBand: String, bBand: String, step: Long,
                       fieldScores: Seq[Column], matchMin: Long,
                       possibleMin: Long): DataFrame = {
    require(fieldScores.nonEmpty, "at least one field score")
    require(matchMin >= possibleMin, s"matchMin $matchMin < possibleMin $possibleMin")
    require(step > 0, s"band step $step must be positive")
    val b3 = b.withColumn("__band", explode(array(
      col(bBand) - step, col(bBand), col(bBand) + step)))
    a.withColumn("__band", col(aBand))
      .join(b3, blockCols :+ "__band")
      .drop("__band")
      .withColumn("score", fieldScores.reduce(_ + _))
      .where(col("score") >= possibleMin)
      .withColumn("cls",
        when(col("score") >= matchMin, lit("match")).otherwise(lit("possible")))
  }

  /** Blocking-quality audit — the pre-flight a 100 TB linkage (or any
    * blocked pair operator) runs BEFORE the join: per block, both
    * sides' row counts, the pair volume the equi-join would generate
    * (n_a·n_b, computed from the counts — no pair is materialized), and
    * an `oversized` flag at `maxPairs` naming exactly the blocks that
    * need salting (q41) or a finer key. One bounded aggregate per side
    * + a full-outer join on the block key: one-sided blocks surface
    * with zero pair volume — the coverage gaps where entities can never
    * match. All-integer.
    */
  def blockingAudit(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                    maxPairs: Long): DataFrame = {
    def sideCounts(df: DataFrame, as: String): DataFrame =
      df.groupBy(blockCols.map(col): _*).agg(count(lit(1)).as(as))
    sideCounts(a, "n_a")
      .join(sideCounts(b, "n_b"), blockCols, "full_outer")
      .select(blockCols.map(col) ++ Seq(
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b")): _*)
      .withColumn("n_pairs", col("n_a") * col("n_b"))
      .withColumn("oversized", col("n_pairs") > maxPairs)
  }

  /** Threshold calibration — the TRAINED half of Fellegi-Sunter: given
    * scored pairs and ground truth, the per-threshold
    * precision/recall curve and a `meets_target` flag marking every
    * threshold whose precision clears the exact rational `precP/precQ`
    * (the caller picks the smallest flagged threshold to maximize
    * recall at the precision floor). One bounded aggregate (pairs
    * collapse to one row per DISTINCT SCORE, map-side partials carrying
    * the weight) + cumulative windows over that score-alphabet-sized
    * relation — the single-partition window is bounded by the integer
    * score range, never the pair stream. Counts integer; precision and
    * recall are each ONE correctly-rounded division; the flag is exact
    * cross-multiplication.
    */
  def thresholdReport(scored: DataFrame, isMatch: Column,
                      precP: Long, precQ: Long): DataFrame = {
    require(precQ > 0 && precP >= 0, s"precision target $precP/$precQ")
    val per = scored.groupBy(col("score")).agg(
      count(lit(1)).as("n"),
      sum(when(isMatch, 1L).otherwise(0L)).as("pos"))
    val cum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("tp", sum(col("pos")).over(cum))
      .withColumn("n_ge", sum(col("n")).over(cum))
      .withColumn("total_pos", sum(col("pos")).over(all))
      .select(col("score").as("threshold"), col("tp"),
        (col("n_ge") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("n_ge").cast("double")).as("prec"),
        (col("tp").cast("double") / col("total_pos").cast("double")).as("recall"),
        (col("tp") * precQ >= lit(precP) * col("n_ge")).as("meets_target"))
  }
}
