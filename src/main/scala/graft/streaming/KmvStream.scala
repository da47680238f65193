package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental KMV sketch maintenance: bottom-k-of-distinct is CLOSED
  * under merge (the bottom-k of a union is the bottom-k of the unions'
  * bottom-ks), so the per-group sketch table accumulates across
  * micro-batches with a pure-builtin merge —
  * `slice(array_sort(array_distinct(flatten(...))), 1, k)` — and the
  * stored table after any prefix of batches EQUALS the batch sketch of
  * everything seen (the q161/q173 accumulate discipline applied to the
  * [[graft.operators.Kmv]] family). State: k longs per group, forever.
  * Published through [[UpsertSink]]'s crash-safe version-dir swap.
  */
object KmvStream {

  /** Merge a batch's partial sketch table (groupCol, kmv) into `table`.
    * The merge is idempotent by construction (distinct bottom-k); the
    * optional `batchId` fence additionally skips the redelivered work.
    */
  def accumulateBatch(table: String, partial: DataFrame,
                      groupCol: String, k: Int,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = partial.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val all = UpsertSink.currentState(spark, table) match {
      case Some(cur) => cur.unionByName(partial)
      case None => partial
    }
    val merged = all.groupBy(col(groupCol))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
        1, k).as("kmv"))
    UpsertSink.publishMerged(spark, table, merged, batchId = batchId, epoch = epoch)
  }
}
