package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Streaming interval union — [[Intervals]] as an accumulate. The
  * carry insight: with batches TIME-PARTITIONED BY START per key (the
  * q237/q251 ingestion contract), a new interval's start exceeds every
  * previous start, so it can only ever merge into the key's LAST
  * island (islands are disjoint and ordered, so the last one holds the
  * maximum end; every closed island's end sits strictly below the open
  * island's start, and therefore below every new start). The state IS
  * the islands themselves:
  *
  *   1. split state into closed islands and the one OPEN island per
  *      key (row_number over |islands| state rows — never row data);
  *   2. re-island {open island (weight = its n_merged)} ∪ {batch rows
  *      (weight 1)} with the batch-local two-window reduction;
  *   3. new state = closed ∪ re-islanded.
  *
  * A closed island is immutable — exactly the watermark argument
  * Structured Streaming makes for append-mode windows, realized here
  * relationally. State grows with |islands| (the OUTPUT), not with
  * rows seen.
  */
object IntervalStream {

  /** Fold one start-ordered batch of (key, start, end, tie) intervals
    * into the island state at `table`.
    */
  def accumulateBatch(table: String, batch: DataFrame, keyCol: String,
                      startCol: String, endCol: String,
                      tieCol: String, batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val fresh = batch
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(keyCol), col(startCol).as("__st"), col(endCol).as("__en"),
        col(tieCol).cast("long").as("__tie"), lit(1L).as("__w"))
    val (closed, pool) = UpsertSink.currentState(spark, table) match {
      case Some(prev) =>
        val rn = row_number().over(Window.partitionBy(col(keyCol))
          .orderBy(col("island_start").desc, col("island_end").desc))
        val marked = prev.withColumn("__rn", rn)
        val open = marked.where(col("__rn") === 1)
          .select(col(keyCol), col("island_start").as("__st"),
            col("island_end").as("__en"), lit(Long.MinValue).as("__tie"),
            col("n_merged").as("__w"))
        (marked.where(col("__rn") > 1)
          .select(keyCol, "island_start", "island_end", "n_merged"),
          open.unionByName(fresh))
      case None =>
        (fresh.where(lit(false))
          .select(col(keyCol), col("__st").as("island_start"),
            col("__en").as("island_end"), col("__w").as("n_merged")),
          fresh)
    }
    val merged = Intervals.mergeIntervalsWeighted(pool, Seq(keyCol),
      "__st", "__en", Seq(col("__tie")), "__w")
      .select(keyCol, "island_start", "island_end", "n_merged")
    UpsertSink.publishMerged(spark, table, closed.unionByName(merged),
      batchId = batchId, epoch = epoch)
  }

  /** The island state as a DataFrame (one row per merged island). */
  def islands(spark: SparkSession, table: String): DataFrame =
    UpsertSink.snapshot(spark, table)
}
