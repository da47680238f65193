package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Retention

/** Incremental cohort-retention maintenance — the streaming form of
  * [[graft.operators.Retention.cohortRetention]], completing the
  * HLL/KMV/postings/reputation/MG accumulate set. The stored state is
  * the compacted distinct (uid, wk) relation itself: distinct-union is
  * the textbook mergeable summary (idempotent, commutative,
  * associative), so the accumulate is EXACT under ANY slicing of the
  * event stream — no exactness window, no sketch error. Per-user
  * cohorts (min week) and the matrix derive from the state at read
  * time; a user's cohort can only move EARLIER as late slices arrive,
  * and the derived matrix always equals the batch operator over the
  * union of everything accumulated. State is bounded by
  * users × active-weeks, never event count; published through
  * [[UpsertSink]]'s crash-safe version-dir swap.
  */
object RetentionStream {

  /** A batch's compacted (uid, wk) partial — the same projection the
    * batch operator runs, dedup'd map-side before anything shuffles.
    */
  def uwPartial(batch: DataFrame, userCol: String, tsCol: String): DataFrame =
    Retention.userWeeks(batch, userCol, tsCol)

  /** Merge a batch partial into the stored state: distinct union
    * (idempotent by construction; the optional `batchId` fence skips the
    * redelivered work).
    */
  def accumulateBatch(table: String, partial: DataFrame,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = partial.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val merged = (UpsertSink.currentState(spark, table) match {
      case Some(cur) => cur.unionByName(partial)
      case None => partial
    }).distinct()
    UpsertSink.publishMerged(spark, table, merged, batchId = batchId, epoch = epoch)
  }

  /** The retention matrix derived from the accumulated state. */
  def matrix(spark: SparkSession, table: String): DataFrame =
    Retention.matrixFromUserWeeks(spark.read.parquet(table))
}
