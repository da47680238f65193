package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online CUSUM — [[graft.operators.ChangePoint]] as a streaming
  * accumulate. The per-row statistic is order-dependent (unlike the
  * q241 drift grid, plain sums do NOT suffice), but the prefix-min
  * identity makes the carry state FOUR integers per group:
  *
  *   c_end  — running Σ(x−k) after the last row seen
  *   min_c  — min prefix sum over all rows seen
  *   peak_s — max statistic so far
  *   first_alarm_ts / n — bookkeeping for the report
  *
  * because a new time-ordered batch composes as
  *   c_i = c_end + lc_i,   m_i = min(min_c, c_end + lm_i),
  *   s_i = c_i − min(0, m_i)
  * with lc/lm the batch-LOCAL prefix sum/min (two windows inside the
  * batch only). Exactness contract, same as the q237 transition
  * carry: batches arrive time-partitioned per group (the natural
  * event-time-ranged ingestion shape); within a batch the (ts, tie)
  * window makes the order total. State = |groups| rows through
  * [[UpsertSink]]'s crash-safe versioned publish; groups silent in a
  * batch carry forward untouched.
  */
object CusumStream {

  /** Fold one time-ordered batch into the state table. `threshold`
    * must be the same value every call (it decides first_alarm_ts at
    * the moment the crossing row is seen).
    */
  def accumulateBatch(table: String, batch: DataFrame, groupCol: String,
                      tsCol: String, tieCol: String, valueCol: String,
                      allowance: Long, threshold: Long,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = batch
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__lc", sum(col(valueCol) - lit(allowance)).over(w))
      .withColumn("__lm", min(col("__lc")).over(w))
    val prev = UpsertSink.currentState(spark, table)
    val joined = prev match {
      case Some(p) => local.join(p, Seq(groupCol), "left")
      case None => local
        .withColumn("c_end", lit(null).cast("long"))
        .withColumn("min_c", lit(null).cast("long"))
        .withColumn("peak_s", lit(null).cast("long"))
        .withColumn("first_alarm_ts", lit(null).cast("long"))
        .withColumn("n", lit(null).cast("long"))
    }
    val cPrev = coalesce(col("c_end"), lit(0L))
    val scored = joined
      .withColumn("__gc", cPrev + col("__lc"))
      .withColumn("__gm",
        least(coalesce(col("min_c"), cPrev + col("__lm")),
          cPrev + col("__lm")))
      .withColumn("__s", col("__gc") - least(lit(0L), col("__gm")))
    val agg = scored.groupBy(col(groupCol)).agg(
      max_by(col("__gc"), struct(col(tsCol), col(tieCol))).as("c_end"),
      min(col("__gm")).as("min_c"),
      greatest(coalesce(min(col("peak_s")), lit(0L)), max(col("__s")))
        .as("peak_s"),
      coalesce(min(col("first_alarm_ts")),
        min(when(col("__s") > lit(threshold), col(tsCol)))).as("first_alarm_ts"),
      (coalesce(min(col("n")), lit(0L)) + count(lit(1))).as("n"))
    val merged = prev match {
      case Some(p) => agg.unionByName(
        p.join(agg.select(col(groupCol)), Seq(groupCol), "left_anti"))
      case None => agg
    }
    UpsertSink.publishMerged(spark, table, merged, batchId = batchId, epoch = epoch)
  }

  /** The monitoring report from state — q242's `cusumReport` columns,
    * derived without touching any row data.
    */
  def report(spark: SparkSession, table: String): DataFrame =
    UpsertSink.snapshot(spark, table)

  /** Report with the alarm verdict recomputed from the stored peak —
    * `threshold` must match the accumulate calls.
    */
  def verdict(spark: SparkSession, table: String, groupCol: String,
              threshold: Long): DataFrame =
    report(spark, table).select(col(groupCol), col("n"),
      col("peak_s").as("max_s"),
      (col("peak_s") > lit(threshold)).as("alarm"),
      col("first_alarm_ts"))
}
