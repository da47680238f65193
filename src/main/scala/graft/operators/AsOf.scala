package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row of the same
  * key with `right.ts <= left.ts` (the time-series point-in-time lookup
  * Spark lacks as a built-in).
  *
  * Implemented as the scalable union + carry-forward-window form rather than
  * a range join: tag both sides, sort within key by (ts, tag) with right
  * rows first at equal timestamps (ASOF's `>=` semantics), and carry the
  * last right payload forward with `last(_, ignoreNulls)` over an unbounded
  * preceding frame. Cost: ONE shuffle on the key (vs. a range-join's
  * per-key quadratic probe); state per task is a single row.
  */
object AsOf {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side; its `valueCols` are attached
    * @param keyCol    equi key
    * @param tsCol     event-time column (same name both sides)
    * @param valueCols right columns to carry (null when no right row is
    *                  at-or-before the left row's ts)
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCols: Seq[String]): DataFrame = {
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
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumns(valueCols.map(c =>
        c -> last(when(col("_tag") === 0, col(c)), ignoreNulls = true).over(w)).toMap)
    carried.where(col("_tag") === 1).drop("_tag")
  }
}
