package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order within each group and cut into fixed token-budget
  * training sequences (the concat-and-chunk scheme); each document is
  * assigned to the sequence in which it STARTS. Downstream, one training
  * sequence = all docs with the same (group, seq_id).
  *
  * Shape: one window cumsum per group — a single shuffle on the group key,
  * running state is O(1) per partition. Parallelism equals the group
  * cardinality, so at 100 TB the group key must be a sharded one — e.g.
  * (source, shard) where shard = hash(doc_id) % k — NOT a handful of global
  * sources; the semantics are per-group either way. No collect, no driver
  * loop.
  */
object Pack {

  /** Adds `n_tokens`, `seq_id` (0-based within group) and `tok_offset` (the
    * doc's first-token offset within its sequence) to `df` — OVERWRITING
    * columns of those names if present (they are this operator's output
    * contract, like any withColumn-producing transform).
    *
    * seq_id = floor((cumsum - n_tokens) / budget): the chunk in which the
    * doc's first token lands when the group is one concatenated token
    * stream cut every `budget` tokens. Oversized docs (> budget) simply
    * span chunks, like they do in real packing.
    */
  def assignSequences(df: DataFrame, idCol: String, groupCols: Seq[String],
                      tokenCount: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the scratch column gets a collision-proof name so the final drop
    // cannot destroy caller data
    val startTok = "__graft_start_tok"
    df.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn(startTok, sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col(startTok) / budget))
      .withColumn("tok_offset", col(startTok) % budget)
      .drop(startTok)
  }

  /** Per-(group, sequence) packing stats: docs packed, tokens of docs
    * starting there, and the fill ratio against the budget (>1 means a doc
    * starting in this chunk spills into the next — expected for the tail
    * doc of every chunk).
    */
  def packStats(df: DataFrame, idCol: String, groupCols: Seq[String],
                tokenCount: Column, budget: Int): DataFrame =
    assignSequences(df, idCol, groupCols, tokenCount, budget)
      .groupBy((groupCols.map(col) :+ col("seq_id")): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        (sum(col("n_tokens")).cast("double") / budget).as("fill_ratio"))

  /** Training-shard writer — the pipeline's OUTPUT stage: lands a packed
    * corpus as directory-partitioned, size-bounded, internally-sorted
    * parquet shards, the layout a trainer's data loader streams
    * sequentially (one dir per (split/source/shard), files capped at
    * `maxRecordsPerFile` rows, rows in `sortCols` order inside each file
    * so sequence ids are contiguous on disk).
    *
    * Scale shape: the explicit repartition on the partition columns
    * aligns write tasks with output directories — each task owns whole
    * dirs, so the file count per dir is ceil(rows / maxRecordsPerFile),
    * not tasks × dirs (the classic small-files explosion when a
    * partitionBy write is fed by an unaligned shuffle). Parallelism =
    * partition-key cardinality; at 100 TB the key must therefore include
    * the sharded component (e.g. (source, md5-mod-k) from
    * [[Sampling.shardFromId]] — the same rule as [[assignSequences]]'s
    * group key, and the caller uses the SAME key for both so sort order
    * and directory layout agree). `maxRecordsPerFile` is enforced by the
    * writer itself (one open file per task at a time — no memory cost).
    */
  def writeShards(df: DataFrame, dir: String, partitionCols: Seq[String],
                  sortCols: Seq[String], maxRecordsPerFile: Long): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)
  }
}
