package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming EXACT percentiles via a value-dictionary accumulate: the
  * per-group (value → count) dictionary is sum-mergeable, so it composes
  * across micro-batches order-free (the q161/q173/q178 accumulate
  * discipline), and any discrete percentile is an exact readout over the
  * stored dictionary — no Greenwald-Khanna error term, no order
  * sensitivity. Redelivery is fenced when the caller passes the
  * `foreachBatch` batch id (recorded atomically with the published state —
  * [[UpsertSink.accumulateBatch]], which this rides); without it, sums
  * re-add and the caller owns exactly-once.
  *
  * State bound: O(groups × distinct values), FOREVER — the honest contract.
  * This is the right streaming-quantile tool when the value domain is
  * bounded by construction (integer cents, bucketed latencies, star
  * ratings, token counts); for unbounded domains the caller quantizes
  * first (the [[graft.operators.Binning]] grid) or accepts the
  * `percentile_approx` sketch of the batch path
  * ([[graft.operators.Percentiles]]). A 1000-executor deployment shards
  * the dictionary by group key exactly like any keyed state.
  *
  * Readout arithmetic is ALL-INTEGER: percentile_disc(p/100) = the
  * smallest value whose cumulative count × 100 ≥ n × p — no double
  * multiply, no rounding mode, bit-identical in any engine.
  */
object PercentileStream {

  /** Fold one micro-batch into the dictionary table at `table`. Pass the
    * `foreachBatch` batch id as `batchId` to make at-least-once
    * redelivery a recorded no-op ([[UpsertSink.alreadyFolded]]).
    */
  def accumulateBatch(table: String, batch: DataFrame,
                      groupCol: String, valueCol: String,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val partial = batch.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    UpsertSink.accumulateBatch(table, partial,
      Seq(groupCol, valueCol), sumCols = Seq("cnt"),
      minCols = Nil, maxCols = Nil, batchId = batchId, epoch = epoch)
  }

  /** Exact discrete percentiles from the accumulated dictionary: one row
    * per group with a `p<NN>` column per requested integer percent, plus
    * `n_rows` (observations folded in) and `n_distinct` (dictionary
    * width — the state-size audit column).
    */
  def percentiles(spark: SparkSession, table: String, groupCol: String,
                  valueCol: String, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be integer 1..100: $percents")
    val dict = UpsertSink.snapshot(spark, table)
    val wc = Window.partitionBy(groupCol).orderBy(valueCol)
    val wg = Window.partitionBy(groupCol)
    val c = dict
      .withColumn("__cum", sum("cnt").over(wc))
      .withColumn("__n", sum("cnt").over(wg))
    val aggs = percents.map(p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col(valueCol)))
        .as(s"p$p")) ++
      Seq(max("__n").as("n_rows"), count(lit(1)).as("n_distinct"))
    c.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
