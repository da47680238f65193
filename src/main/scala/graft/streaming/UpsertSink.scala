package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PRODUCTION landing of the streaming latest-wins upsert: each
  * micro-batch merges into a compacted parquet table via `foreachBatch` —
  * the write-back loop of the reference's cache refresh
  * (`/root/reference/02_method2_manual_vector_embedding.sql:415-418`) as a
  * continuously-maintained table instead of q112's memory-sink gate form.
  *
  * Per batch: ONE `max_by` hash aggregation over (current table ∪ batch) —
  * the [[graft.operators.Upsert.latestWins]] shape (no window sort; the
  * shuffle carries one candidate per (key, partition)) — written to a
  * staging dir and swapped in with a filesystem rename, so a reader never
  * observes a half-written table and the job reads its own previous output
  * safely (parquet overwrite-in-place would delete the files backing the
  * lazy self-read).
  *
  * The stored table KEEPS the `(versionCol, prioCol)` ordering key, so a
  * later batch — or an at-least-once REDELIVERY of an already-merged row —
  * compares against the stored winner's full key and merges idempotently.
  *
  * Scale: state lives in the table itself (no executor state store); each
  * compaction is a shuffle of batch + table. For a 100 TB table the swap
  * unit becomes a key-range partition (compact only partitions the batch
  * touches — `partitionBy` on a key hash mod makes the rename per-dir);
  * the per-batch merge shape is unchanged.
  */
object UpsertSink {

  /** Merge one micro-batch into the compacted table at `table`. Safe to
    * call from `foreachBatch` (it is also the whole body of it).
    */
  def compactBatch(table: String, batch: DataFrame, keyCols: Seq[String],
                   versionCol: String, prioCol: String): Unit = {
    val spark = batch.sparkSession
    val tPath = new Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all =
      if (fs.exists(tPath)) {
        val cur = spark.read.parquet(table)
        cur.unionByName(batch.select(cur.columns.map(col): _*))
      } else batch
    val payloadCols = all.columns.filterNot(keyCols.contains).toSeq
    val merged = all.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*),
        struct(col(versionCol), col(prioCol))).as("_w"))
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_w.$c").as(c)): _*)
    val staging = new Path(table + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    // the swap: delete-then-rename is atomic per entry on HDFS/local; a
    // crash between the two leaves the staging dir for the NEXT batch's
    // overwrite, and streaming checkpointing replays the batch
    fs.delete(tPath, true)
    if (!fs.rename(staging, tPath))
      sys.error(s"UpsertSink: rename $staging -> $tPath failed")
  }

  /** Wire a versioned stream into a compacted table: every batch runs
    * [[compactBatch]]. Caller starts/stops the returned writer (and owns
    * the checkpoint location).
    */
  def writer(stream: DataFrame, table: String, keyCols: Seq[String],
             versionCol: String, prioCol: String) =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        compactBatch(table, batch, keyCols, versionCol, prioCol)
    }

  /** The INCREMENTAL-MATERIALIZED-VIEW sibling of [[compactBatch]]: the
    * table holds per-key MERGEABLE aggregates (counts re-merge by sum;
    * min/max by min/max), and each micro-batch folds its own partial
    * aggregate in — (table ∪ batch-partial) re-aggregated, staged, swapped.
    * The running view is O(keys) on disk no matter how much data has
    * streamed through; only SELF-MERGEABLE metrics belong here (a count, a
    * min — never an avg, which callers derive from sum/count at read
    * time). The batch partial aggregates FIRST, so the merge input is
    * O(batch keys), not O(batch rows).
    *
    * `countCols -> sum`, `minCols -> min`, `maxCols -> max` on merge; the
    * batch side must already carry those columns as its partial values
    * (use [[partialCounts]] for the common count/min/max shape).
    */
  def accumulateBatch(table: String, batchPartial: DataFrame,
                      keyCols: Seq[String], sumCols: Seq[String],
                      minCols: Seq[String], maxCols: Seq[String]): Unit = {
    val spark = batchPartial.sparkSession
    val tPath = new Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all =
      if (fs.exists(tPath)) {
        val cur = spark.read.parquet(table)
        cur.unionByName(batchPartial.select(cur.columns.map(col): _*))
      } else batchPartial
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++ maxCols.map(c => max(col(c)).as(c))
    val merged = all.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val staging = new Path(table + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    fs.delete(tPath, true)
    if (!fs.rename(staging, tPath))
      sys.error(s"UpsertSink: rename $staging -> $tPath failed")
  }
}
