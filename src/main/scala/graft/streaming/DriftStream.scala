package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Drift

/** Online feature-drift monitoring — the streaming form of
  * [[Drift.ksDrift]]: the live period's per-group grid summary
  * accumulates across micro-batches by PLAIN COLUMN SUMS (every field
  * of the summary — n and each cumulative grid count — is a sum, so
  * the merge is exact under any slicing; the q232/q237 family's
  * simplest member), and the KS verdict against a frozen REFERENCE
  * summary derives from the accumulated state at read time with the
  * identical integer cross-product math. State = |groups| × |grid|
  * integers; published through [[UpsertSink]]'s crash-safe swap.
  */
object DriftStream {

  /** A batch's summary partial (same shape as [[Drift.summarize]]). */
  def partial(batch: DataFrame, groupCol: String, valueCol: String,
              cuts: Seq[Double]): DataFrame =
    Drift.summarize(batch, groupCol, valueCol, cuts)

  /** Merge a batch partial into the stored summary: sum every field.
    * Sums re-add on redelivery — pass the `foreachBatch` batch id as
    * `batchId` to fence it ([[UpsertSink.alreadyFolded]]).
    */
  def accumulateBatch(table: String, partial: DataFrame, groupCol: String,
                      cuts: Seq[Double],
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = partial.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val all = UpsertSink.currentState(spark, table) match {
      case Some(cur) => cur.unionByName(partial)
      case None => partial
    }
    val sums = (Seq("n") ++ cuts.indices.map(i => s"c$i"))
      .map(c => sum(col(c)).as(c))
    val merged = all.groupBy(col(groupCol)).agg(sums.head, sums.tail: _*)
    UpsertSink.publishMerged(spark, table, merged, batchId = batchId, epoch = epoch)
  }

  /** The drift verdict of the accumulated live summary vs a reference
    * summary.
    */
  def verdict(spark: SparkSession, table: String, reference: DataFrame,
              groupCol: String, cuts: Seq[Double], tauP: Long,
              tauQ: Long): DataFrame =
    // snapshot(), not a plain-path read: the _SUCCESS-gated
    // complete-version resolution is the only read UpsertSink offers on
    // filesystems without symlinks (HDFS/S3) — same as every sibling
    // stream's readout
    Drift.verdict(reference, UpsertSink.snapshot(spark, table), groupCol,
      cuts, tauP, tauQ)
}
