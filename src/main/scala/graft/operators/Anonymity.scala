package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk governance for training corpora — the
  * structural complement to [[Pii]] (regex scrubbing removes DIRECT
  * identifiers; this measures what the remaining QUASI-identifiers
  * still reveal in combination):
  *
  *   - [[audit]]: per QI-combination cell, the k-anonymity group size
  *     and the l-diversity distinct-sensitive-value count — the two
  *     standard disclosure measures (Sweeney 2002; Machanavajjhala
  *     et al. 2007), each one exact integer per cell.
  *   - [[withRecodeLevel]]: LOCAL RECODING over a generalization
  *     ladder — every row gets the finest ladder level at which its
  *     group reaches k (the last level = suppression), so a release
  *     pipeline can coarsen exactly the rows that need it instead of
  *     generalizing the whole table to the worst cell's level.
  *
  * Scale shape: the audit is ONE hash aggregation over the QI columns
  * (count + exact count-distinct; at 100 TB swap the exact ndv for
  * `approx_count_distinct` — the k side, which drives recoding, never
  * needs it). Recoding computes one bounded counts relation per ladder
  * level (|cells| rows each — orders of magnitude smaller than the
  * data) and joins them back on their own QI keys; AQE broadcasts
  * them when small, and the row stream itself is never shuffled more
  * than once per level.
  */
object Anonymity {

  /** Per-cell audit: group size `n`, distinct sensitive values `ndv`,
    * and the k/l verdicts. |cells| rows out.
    */
  def audit(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
            k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k/l must be positive: $k/$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("ndv"))
      .withColumn("k_ok", col("n") >= lit(k))
      .withColumn("l_ok", col("ndv") >= lit(l))
  }

  /** Assign each row the finest level of `ladder` (a sequence of QI
    * projections, finest first — each level SHOULD be a coarsening of
    * the previous) whose cell holds at least `k` rows. Rows whose
    * group is too small at EVERY level get `ladder.size` — the
    * suppression bucket.
    */
  def withRecodeLevel(df: DataFrame, ladder: Seq[Seq[String]], k: Long,
                      outCol: String = "anon_level"): DataFrame = {
    require(ladder.nonEmpty, "empty generalization ladder")
    require(k >= 1, s"k must be positive: $k")
    val joined = ladder.zipWithIndex.foldLeft(df) { case (acc, (qi, i)) =>
      val counts = df.groupBy(qi.map(col): _*)
        .agg(count(lit(1)).as(s"__n$i"))
      acc.join(counts, qi, "left")
    }
    val level = ladder.indices.foldRight(lit(ladder.size)) { (i, elze) =>
      when(col(s"__n$i") >= lit(k), lit(i)).otherwise(elze)
    }
    joined.withColumn(outCol, level)
      .drop(ladder.indices.map(i => s"__n$i"): _*)
  }
}
