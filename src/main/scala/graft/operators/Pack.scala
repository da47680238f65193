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
                  sortCols: Seq[String], maxRecordsPerFile: Long): Unit =
    prepareShards(df, partitionCols, sortCols, maxRecordsPerFile)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)

  /** The shuffle [[writeShards]] feeds the writer — exposed so specs can
    * assert the write-parallelism shape without reading finished output.
    *
    * Write parallelism is VOLUME-PROPORTIONAL, not one-task-per-directory:
    * a per-key count (one small aggregate, broadcast back — the key space
    * is bounded by design: sources × shard mod, thousands at most) sizes
    * each key's split count at ceil(rows / maxRecordsPerFile), and rows
    * hash among their key's splits on the sort columns. Each (key, split)
    * lands in one task, so a dominant source writes its directory with
    * proportionally many concurrent tasks instead of serializing behind
    * one (the round-6 skew flag), while the file count per dir stays
    * ceil(rows / cap) — no small-files explosion. With empty `sortCols`
    * the split hash is constant and the old one-task-per-dir shape
    * returns; callers wanting parallel writes pass the in-file sort key
    * (the packing pipeline's (seq_id, doc_id)).
    */
  def prepareShards(df: DataFrame, partitionCols: Seq[String],
                    sortCols: Seq[String], maxRecordsPerFile: Long): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val nsplit = "__graft_nsplit"
    val fileNo = "__graft_file_no"
    val counts = df.groupBy(partitionCols.map(col): _*)
      .agg(ceil(count(lit(1)).cast("double") / maxRecordsPerFile).cast("int")
        .as(nsplit))
    // null-safe equality: a null partition value still routes to its
    // __HIVE_DEFAULT_PARTITION__ dir and must pick up its split count
    val joinCond = partitionCols.map(c => df(c) <=> counts(c)).reduce(_ && _)
    val splitHash =
      if (sortCols.isEmpty) lit(0L) else xxhash64(sortCols.map(col): _*)
    val joined = partitionCols.foldLeft(df.join(broadcast(counts), joinCond)) {
      (d, c) => d.drop(counts(c)) // drop the COUNTS side copy only
    }
    joined
      .withColumn(fileNo, pmod(splitHash, greatest(col(nsplit), lit(1))))
      .repartition((partitionCols :+ fileNo).map(col): _*)
      .drop(nsplit, fileNo)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
  }
}
