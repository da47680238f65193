package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Streaming uniform sample: keep the k rows with the SMALLEST
  * deterministic hash-uniform key per group (bottom-k sampling). Bottom-k
  * is closed under merge — the bottom-k of a union is the bottom-k of the
  * parts' bottom-ks (the same identity [[KmvStream]] rides for distinct
  * sketches; here rows keep their payload, making it a SAMPLE, not a
  * cardinality sketch) — so state accumulates order-free across
  * micro-batches and after ANY prefix of batches equals the batch
  * bottom-k of everything seen, bit-for-bit.
  *
  * Two properties the classic seeded reservoir (Vitter's R) does NOT have
  * in a distributed stream:
  *  - order-free: reservoir replacement depends on arrival order, so two
  *    executors feeding the same rows in different orders disagree;
  *    bottom-k depends only on the SET seen.
  *  - idempotent on redelivery: membership is keyed by id (dup ids
  *    collapse in the merge), so an at-least-once redelivery cannot skew
  *    the sample — no batch-id fencing needed (contrast the sum-merge
  *    accumulates, which fence via `batchId`). Idempotence covers
  *    REDELIVERY only, not concurrency: like every member of the
  *    accumulate family, the fold is a read-modify-write over the
  *    [[UpsertSink]] state, so the table must have a SINGLE WRITER (one
  *    streaming query / one `foreachBatch` at a time) — two interleaved
  *    callers would each merge against the same prior version and the
  *    later publish would lose the earlier batch's rows.
  *
  * State: k rows per group, forever. Uniformity: md5-uniform in the id
  * (the corpus-wide sampling convention, [[Sampling.uniformFromId]]), so
  * the INCLUSION DECISION is reproducible by any engine and the stored
  * `u` column is the audit trail.
  */
object SampleStream {

  /** Fold one micro-batch into the bottom-k sample table at `table`.
    * `batch` must carry `groupCol` and a unique `idCol`; sampled rows
    * keep exactly (group, id, u).
    */
  def accumulateBatch(table: String, batch: DataFrame, groupCol: String,
                      idCol: String, k: Int, salt: String = ":rsv"): Unit = {
    require(k > 0, s"sample size k=$k must be positive")
    val spark = batch.sparkSession
    val part = batch.select(col(groupCol), col(idCol),
      Sampling.uniformFromId(col(idCol), salt).as("u"))
    val all = UpsertSink.currentState(spark, table) match {
      case Some(cur) => cur.unionByName(part)
      case None => part
    }
    val w = Window.partitionBy(groupCol).orderBy(col("u"), col(idCol))
    val merged = all.dropDuplicates(groupCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
    UpsertSink.publishMerged(spark, table, merged)
  }
}
