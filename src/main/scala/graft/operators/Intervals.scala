package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union (gaps-and-islands) — the RANGE sibling of
  * [[graft.streaming.Sessionize]] (which islands POINT events by gap):
  * given per-key intervals [start, end], merge every overlapping-or-
  * touching run into one island, so downstream can ask coverage
  * questions ("how long was at least one shipment in flight?") that
  * row-level data cannot answer without the union.
  *
  * The merge is the classic two-window reduction — no self-join, no
  * explode-to-days, no iteration:
  *
  *   new_island_i = start_i > max(end) over rows [unbounded, i-1]
  *   island_id_i  = Σ_{j≤i} new_island_j
  *
  * then one hash agg per (key, island). Scale shape: one hash
  * partition by key + one in-partition sort; a day-explode
  * alternative would multiply rows by interval length and die at
  * 100 TB, and a self-join alternative is quadratic per key. Islands
  * touch-merge (start == running end joins) — adjacency is coverage.
  *
  * All comparisons happen in the column's own type (dates, timestamps,
  * longs) — nothing is converted, so the result is exact and the
  * ordering total once `tieCols` make it so.
  */
object Intervals {

  /** Per-row island id within each key, ordered by (start, end,
    * tieCols). Rows with a null start or end are dropped (an interval
    * without both endpoints is not an interval).
    */
  def withIslands(df: DataFrame, keyCols: Seq[String], startCol: String,
                  endCol: String, tieCols: Seq[Column],
                  outCol: String = "island"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val order = col(startCol) +: col(endCol) +: tieCols
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__new", when(
        col(startCol) > max(col(endCol)).over(wPrev), 1L).otherwise(lit(0L)))
      .withColumn(outCol, sum(col("__new")).over(wRun))
      .drop("__new")
  }

  /** The merged islands: one row per (key, island) with the union
    * bounds and how many source intervals collapsed into it.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
                     endCol: String, tieCols: Seq[Column]): DataFrame =
    withIslands(df, keyCols, startCol, endCol, tieCols)
      .groupBy((keyCols :+ "island").map(col): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))

  /** [[mergeIntervals]] with a per-row weight instead of count(1) — an
    * input row standing for an ALREADY-MERGED island (the streaming
    * carry, [[graft.streaming.IntervalStream]]) contributes its own
    * merge count, so re-islanding composes exactly.
    */
  def mergeIntervalsWeighted(df: DataFrame, keyCols: Seq[String],
                             startCol: String, endCol: String,
                             tieCols: Seq[Column],
                             weightCol: String): DataFrame =
    withIslands(df, keyCols, startCol, endCol, tieCols)
      .groupBy((keyCols :+ "island").map(col): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        sum(col(weightCol)).as("n_merged"))
}
