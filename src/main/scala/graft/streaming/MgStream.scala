package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental Misra-Gries heavy-hitter maintenance — the streaming form
  * of [[graft.operators.Vocab.heavyHittersByGroup]]: per-group counter
  * tables accumulate across micro-batches with the MERGEABLE-summaries
  * rule (Agarwal et al., PODS'12 — sum counts by token, then subtract
  * the (capacity+1)-th largest sum and drop non-positives), replayed
  * here as relational ops so the stored table IS the sketch. State:
  * ≤ `capacity` (token, n) rows per group, forever. Published through
  * [[UpsertSink]]'s crash-safe version-dir swap, like the KMV/HLL/
  * postings accumulates.
  *
  * Exactness window (the gate's contract, same as the batch leg): while
  * a group's distinct tokens ≤ capacity no subtraction ever fires and
  * the accumulated counts are EXACT per-group token counts — so the
  * streaming accumulate lands on q110's batch oracle verbatim. Past the
  * window it is a valid MG summary (undercount ≤ N/(capacity+1)), with
  * the batch leg's caveat that results are merge-order-dependent.
  */
object MgStream {

  /** A batch's per-group MG partial (groupCol, token, n) — the SAME
    * aggregator the batch leg runs, exploded to rows for the table
    * merge.
    */
  def mgPartial(batch: DataFrame, groupCol: String, textCol: String,
                capacity: Int): DataFrame = {
    val mg = udaf(new graft.operators.Vocab.MisraGries(capacity),
      Encoders.STRING)
    batch
      .select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol)).agg(mg(col("token")).as("hh"))
      .select(col(groupCol), explode(col("hh")).as("e"))
      .select(col(groupCol), col("e._1").as("token"), col("e._2").as("n"))
  }

  /** Merge a batch partial into the stored sketch table. The per-group
    * window ranks ≤ 2·capacity rows (current sketch + partial, each
    * capped) — bounded by the sketch, never by the stream.
    */
  def accumulateBatch(table: String, partial: DataFrame,
                      groupCol: String, capacity: Int,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = partial.sparkSession
    if (batchId.exists(UpsertSink.alreadyFolded(spark, table, _, epoch))) return
    val all = UpsertSink.currentState(spark, table) match {
      case Some(cur) => cur.unionByName(partial)
      case None => partial
    }
    val summed = all.groupBy(col(groupCol), col("token"))
      .agg(sum(col("n")).as("n"))
    val byCount = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col("token"))
    val grp = Window.partitionBy(col(groupCol))
    val merged = summed
      .withColumn("__rn", row_number().over(byCount))
      // the (capacity+1)-th largest count, or null when the group fits
      .withColumn("__d",
        max(when(col("__rn") === capacity + 1, col("n"))).over(grp))
      .withColumn("n", col("n") - coalesce(col("__d"), lit(0L)))
      .where(col("n") > 0)
      .select(col(groupCol), col("token"), col("n"))
    UpsertSink.publishMerged(spark, table, merged, batchId = batchId, epoch = epoch)
  }
}
