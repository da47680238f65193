package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Hll

/** Streaming k-anonymity / l-diversity gate — the landing-zone form of
  * [[graft.operators.Anonymity.audit]]: as batches of a corpus arrive,
  * keep per-QI-cell state small enough to audit continuously:
  *
  *   - cell counts (the k side): plain sums — exact under any slicing;
  *   - sensitive-value diversity (the l side): the bit-portable HLL
  *     register table, MAX-mergeable on (cell, bucket) — the exact
  *     distinct count is the one thing that cannot stream in bounded
  *     state, so the online gate estimates it (q160/q161's sketch, the
  *     q243 batch audit keeps the exact ndv for release time).
  *
  * Both merges are order-free (sum, max), so the accumulate is exact-
  * to-the-sketch under ANY batch slicing — no carry state, no time
  * contract (contrast [[CusumStream]]). State = |cells| + |cells|×64
  * rows through the crash-safe versioned publish.
  */
object AnonymityStream {

  /** Fold one batch of rows into the `dir/counts` + `dir/regs` state.
    * Redelivery fencing (`batchId`): each table fences independently —
    * both legs fold only (their prior state, the batch), so a crash
    * between the two publishes replays into a consistent pair (the
    * published leg skips, the torn leg recomputes identically).
    */
  def accumulateBatch(dir: String, batch: DataFrame, quasiCols: Seq[String],
                      sensitive: Column,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val qi = quasiCols.map(col)
    val cleaned = batch.where(
      quasiCols.map(col(_).isNotNull).reduce(_ && _) && sensitive.isNotNull)

    if (!batchId.exists(UpsertSink.alreadyFolded(spark, s"$dir/counts", _, epoch))) {
      val pc = cleaned.groupBy(qi: _*).agg(count(lit(1)).as("n"))
      val allC = UpsertSink.currentState(spark, s"$dir/counts")
        .map(_.unionByName(pc)).getOrElse(pc)
      UpsertSink.publishMerged(spark, s"$dir/counts",
        allC.groupBy(qi: _*).agg(sum("n").as("n")), batchId = batchId, epoch = epoch)
    }

    if (!batchId.exists(UpsertSink.alreadyFolded(spark, s"$dir/regs", _, epoch))) {
      val pr = Hll.registers(cleaned, quasiCols, sensitive)
      val allR = UpsertSink.currentState(spark, s"$dir/regs")
        .map(_.unionByName(pr)).getOrElse(pr)
      UpsertSink.publishMerged(spark, s"$dir/regs",
        allR.groupBy((qi :+ col("bucket")): _*).agg(max("reg").as("reg")),
        batchId = batchId, epoch = epoch)
    }
  }

  /** The audit from state: per cell, exact n, the HLL diversity
    * estimate, and the k/l verdicts. Touches no row data.
    */
  def audit(spark: SparkSession, dir: String, quasiCols: Seq[String],
            k: Long, lTau: Double): DataFrame = {
    val counts = UpsertSink.snapshot(spark, s"$dir/counts")
    val est = Hll.estimateFromRegisters(
      UpsertSink.snapshot(spark, s"$dir/regs"), quasiCols)
    counts.join(est, quasiCols)
      .withColumn("k_ok", col("n") >= lit(k))
      .withColumn("l_ok_est", col("hll_est") >= lit(lTau))
  }
}
