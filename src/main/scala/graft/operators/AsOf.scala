package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the nearest right row of the same
  * key at-or-before (Backward) or at-or-after (Forward) the left row's
  * event time, optionally within a tolerance — the time-series point-in-time
  * lookup Spark lacks as a built-in (pandas `merge_asof`, kdb `aj`,
  * DuckDB/Flink ASOF semantics).
  *
  * Implemented as the scalable union + carry-forward-window form rather than
  * a range join: tag both sides, sort within key by event time (reversed for
  * Forward) with right rows first at equal timestamps (`>=`/`<=` includes
  * equality), and carry the last right payload forward with
  * `last(_, ignoreNulls)` over an unbounded preceding frame. Cost: ONE
  * shuffle on the key (vs. a range-join's per-key quadratic probe); state
  * per task is a single row. The tolerance check compares integer
  * microseconds (`unix_micros`), not floating epoch seconds, so boundary
  * rows are deterministic at any timestamp precision.
  */
object AsOf {

  sealed trait Direction
  /** Match the latest right row with `right.ts <= left.ts`. */
  case object Backward extends Direction
  /** Match the earliest right row with `right.ts >= left.ts`. */
  case object Forward extends Direction

  /** @param left            probe side (keeps all its rows)
    * @param right           reference side; its `valueCols` are attached
    * @param keyCol          equi key
    * @param tsCol           event-time column (same name both sides)
    * @param valueCols       right columns to carry (null when no right row
    *                        matches)
    * @param direction       Backward (default) or Forward
    * @param toleranceMicros max |left.ts - right.ts| in microseconds; a
    *                        nearest match farther than this is nulled (the
    *                        left row is kept — merge_asof tolerance
    *                        semantics)
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCols: Seq[String], direction: Direction = Backward,
           toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_tag", lit(1))
      .withColumns(valueCols.map(c => c -> lit(null).cast(
        right.schema(c).dataType)).toMap)
      .select((Seq(keyCol, tsCol, "_tag") ++ valueCols
        ++ leftCols.filterNot(c => c == keyCol || c == tsCol)).map(col): _*)
    val r = right
      .withColumn("_tag", lit(0))
      .withColumns(leftCols.filterNot(c => c == keyCol || c == tsCol)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select((Seq(keyCol, tsCol, "_tag") ++ valueCols
        ++ leftCols.filterNot(c => c == keyCol || c == tsCol)).map(col): _*)
    val ts = direction match {
      case Backward => col(tsCol).asc
      case Forward  => col(tsCol).desc
    }
    val w = Window.partitionBy(keyCol).orderBy(ts, col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the nearest right ROW as one struct: ignoreNulls must skip only
    // the interleaved left rows, never a right row whose value column is
    // null — otherwise the value could come from a farther row than the one
    // the tolerance is measured against (merge_asof matches rows, and a
    // matched row's null stays null)
    val rowStruct = struct(col(tsCol).as("_ts") +: valueCols.map(col): _*)
    val carried = l.unionByName(r)
      .withColumn("_asof_row",
        last(when(col("_tag") === 0, rowStruct), ignoreNulls = true).over(w))
    val inTol: org.apache.spark.sql.Column = toleranceMicros match {
      case None => lit(true)
      case Some(tol) =>
        val matchedTs = col("_asof_row").getField("_ts")
        val gap = direction match {
          case Backward => unix_micros(col(tsCol)) - unix_micros(matchedTs)
          case Forward  => unix_micros(matchedTs) - unix_micros(col(tsCol))
        }
        gap <= tol
    }
    carried
      .withColumns(valueCols.map(c =>
        c -> when(inTol, col("_asof_row").getField(c))).toMap)
      .where(col("_tag") === 1).drop("_tag", "_asof_row")
  }
}
