package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
