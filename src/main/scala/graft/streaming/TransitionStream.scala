package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Transitions

/** Incremental Markov transition-matrix maintenance — the streaming
  * form of [[Transitions.transitionMatrix]], and the first accumulate
  * here that needs CARRY STATE: a transition can straddle a micro-batch
  * boundary, so summing per-batch counts alone would silently drop one
  * junction transition per user per batch. The state is therefore two
  * tables:
  *
  *   - `counts`: (from_state, to_state, n) — sum-mergeable, bounded by
  *     state², exactly like the HLL/KMV/MG accumulates;
  *   - `last`:   each user's latest event (uid, ts, eid, st) — ONE row
  *     per user, prepended to the next batch so `lead` over
  *     (carry ∪ batch) counts the junction transition along with the
  *     in-batch ones. The carry row only ever contributes its OUTGOING
  *     edge (its incoming edge was counted when it arrived), so nothing
  *     double-counts.
  *
  * Exactness contract: batches must arrive time-partitioned per user
  * (every event in batch k+1 later in the (ts, eid) order than the
  * user's events in batches <= k) — the natural shape of event-time
  * ranged ingestion. Under that contract the accumulated counts equal
  * the batch operator over the union, bit-for-bit. State is
  * users + state² rows, never the stream; published through
  * [[UpsertSink]]'s crash-safe swap.
  */
object TransitionStream {

  /** Merge one batch. `dir` holds the two state tables (`$dir/counts`,
    * `$dir/last`).
    *
    * Redelivery fencing (`batchId`): each table fences INDEPENDENTLY —
    * both folds are deterministic functions of (their prior state, the
    * batch), so a crash between the two publishes replays into a
    * consistent pair: the already-published leg is skipped by its own
    * fence, the torn leg recomputes from its unchanged prior state and
    * the redelivered batch, landing exactly where the crashed attempt
    * would have.
    */
  def accumulateBatch(dir: String, batch: DataFrame, entityCol: String,
                      tsCol: String, idCol: String, stateCol: String,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val countsDone =
      batchId.exists(UpsertSink.alreadyFolded(spark, s"$dir/counts", _, epoch))
    val lastDone =
      batchId.exists(UpsertSink.alreadyFolded(spark, s"$dir/last", _, epoch))
    if (countsDone && lastDone) return
    val b = batch
      .where(col(entityCol).isNotNull && col(stateCol).isNotNull)
      .select(col(entityCol).as("uid"), col(tsCol).as("ts"),
        col(idCol).as("eid"), col(stateCol).as("st"))
    val withCarry = UpsertSink.currentState(spark, s"$dir/last") match {
      case Some(c) => c.unionByName(b)
      case None => b
    }
    if (!countsDone) {
      val batchCounts = Transitions.transitionCounts(
        withCarry, "uid", Seq(col("ts"), col("eid")), "st")
      val mergedCounts = (UpsertSink.currentState(spark, s"$dir/counts") match {
        case Some(cur) => cur.unionByName(batchCounts)
        case None => batchCounts
      }).groupBy("from_state", "to_state").agg(sum(col("n")).as("n"))
      UpsertSink.publishMerged(spark, s"$dir/counts", mergedCounts,
        batchId = batchId, epoch = epoch)
    }
    if (!lastDone) {
      // max_by the (ts, eid) struct: the user's new latest event
      val newLast = withCarry
        .groupBy("uid")
        .agg(max(struct(col("ts"), col("eid"), col("st"))).as("m"))
        .select(col("uid"), col("m.ts").as("ts"), col("m.eid").as("eid"),
          col("m.st").as("st"))
      UpsertSink.publishMerged(spark, s"$dir/last", newLast,
        batchId = batchId, epoch = epoch)
    }
  }

  /** The transition matrix derived from the accumulated counts. */
  def matrix(spark: SparkSession, dir: String): DataFrame =
    Transitions.matrixFromCounts(spark.read.parquet(s"$dir/counts"))
}
