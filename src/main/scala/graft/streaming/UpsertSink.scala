package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PRODUCTION landing of the streaming latest-wins upsert: each
  * micro-batch merges into a compacted parquet table via `foreachBatch` —
  * the write-back loop of the reference's cache refresh
  * (`/root/reference/02_method2_manual_vector_embedding.sql:415-418`) as a
  * continuously-maintained table instead of q112's memory-sink gate form.
  *
  * Per batch: ONE `max_by` hash aggregation over (current table ∪ batch) —
  * the [[graft.operators.Upsert.latestWins]] shape (no window sort; the
  * shuffle carries one candidate per (key, partition)).
  *
  * == Storage layout: immutable versions, atomic pointer ==
  *
  * Each merge publishes a NEW immutable directory `<table>__v<N>`; a
  * version is COMPLETE iff its `_SUCCESS` marker exists (written last by
  * Spark's output committer). The current table is always "the highest
  * complete version", recovered by a directory scan — so there is NO crash
  * point that loses merged state:
  *
  *  - crash mid-write of v(N+1): no `_SUCCESS`, v(N) still current; the
  *    replayed batch overwrites the partial dir and re-merges (idempotent —
  *    the stored `(versionCol, prioCol)` keys make redelivery a no-op);
  *  - crash after v(N+1) completes: recovery scan finds it; done.
  *
  * (The previous delete-then-rename swap could lose the WHOLE merged table
  * if the process died between the delete and the rename — the staging dir
  * held the only copy and the next batch's overwrite clobbered it.)
  *
  * == Reader isolation contract ==
  *
  *  - [[snapshot]] pins the concrete current-version directory. Versions
  *    are immutable and the previous version is retained until the NEXT
  *    publish (retention window = 1), so a snapshot taken before a merge
  *    still reads its full, unchanged content after the merge lands.
  *  - Plain-path readers (`spark.read.parquet(table)`) go through a
  *    symlink that is swapped ATOMICALLY (POSIX rename of a fresh link):
  *    any single resolution sees wholly-old or wholly-new — never a torn
  *    or half-written table. A long scan that overlaps a swap can observe
  *    `FileNotFoundException` once its listed files age out (two publishes
  *    later); such readers retry or use [[snapshot]]. On filesystems
  *    without symlinks (HDFS/S3) plain-path reads are not offered —
  *    [[snapshot]] is the read API there.
  *
  * Scale: state lives in the table itself (no executor state store); each
  * compaction is a shuffle of batch + table. For a 100 TB table the swap
  * unit becomes a key-range partition (compact only partitions the batch
  * touches — `partitionBy` on a key hash mod makes the version dir
  * per-range); the per-batch merge shape is unchanged.
  */
object UpsertSink {

  /** Sidecar inside each version dir recording the highest micro-batch id
    * folded into the table by a fenced accumulate (see [[accumulateBatch]]),
    * optionally scoped to an EPOCH (the streaming query's checkpoint
    * identity — see [[checkpointEpoch]]). Written into the STAGING dir
    * before the atomic rename that publishes the version, so a complete
    * version can never exist without its fence record — there is no crash
    * window between "state includes batch B" and "B is recorded as folded".
    *
    * File format: line 1 = batch id; optional line 2 = epoch (absent on
    * epoch-less records — the legacy single-line format still parses).
    *
    * Filesystem contract: the publish rename must be ATOMIC (local fs,
    * HDFS). On an object store whose rename is a non-atomic copy (S3A), a
    * crash mid-"rename" could materialize `_SUCCESS` without the sidecar,
    * and a replayed batch would re-fold — deploy the fenced accumulates
    * against a rename-atomic filesystem, the same way Structured
    * Streaming's own checkpoint requires one.
    */
  private val FenceFile = "_folded_batch"

  /** The fold-fence record: the highest `batchId` folded, scoped to the
    * `epoch` it was folded under (`None` = an epoch-less record).
    */
  final case class FoldFence(batchId: Long, epoch: Option[String])

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, dir) pairs of COMPLETE versions (have `_SUCCESS`), ascending. */
  private def completeVersions(fs: FileSystem, table: String): Seq[(Int, Path)] = {
    val tPath = new Path(table)
    val parent = tPath.getParent
    val prefix = tPath.getName + "__v"
    if (parent == null || !fs.exists(parent)) return Seq.empty
    fs.listStatus(parent).toSeq
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit)
            && n.length > prefix.length)
          Some((n.drop(prefix.length).toInt, p))
        else None
      }
      .filter { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
      .sortBy(_._1)
  }

  /** Concrete directory of the current table version: the crash-safe
    * read anchor. `None` before the first publish (unless a pre-versioned
    * plain directory exists — the migration seed — which is returned).
    */
  def snapshotPath(spark: SparkSession, table: String): Option[String] = {
    val fs = fsOf(spark, table)
    completeVersions(fs, table).lastOption.map(_._2.toString)
      .orElse {
        // migration: a plain (non-symlink, pre-versioned) table dir
        val t = new Path(table)
        if (fs.exists(t) && !isSymlink(table)) Some(table) else None
      }
  }

  /** Pinned-version read: immune to concurrent [[compactBatch]] swaps for
    * at least one subsequent publish (see the retention contract above).
    */
  def snapshot(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(snapshotPath(spark, table).getOrElse(
      sys.error(s"UpsertSink.snapshot: no complete version at $table")))

  /** The current fold fence of `table` — `None` before the first fenced
    * fold. Read from the CURRENT complete version's sidecar, which the
    * publish rename made atomic with the data, so the answer is never
    * ahead of or behind the visible state.
    */
  def foldedFence(spark: SparkSession, table: String): Option[FoldFence] = {
    val fs = fsOf(spark, table)
    completeVersions(fs, table).lastOption.flatMap { case (_, p) =>
      val f = new Path(p, FenceFile)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        val txt =
          try org.apache.commons.io.IOUtils.toString(in,
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val lines = txt.split("\n", -1).map(_.trim)
        Some(FoldFence(lines(0).toLong,
          lines.drop(1).find(_.nonEmpty)))
      }
    }
  }

  /** Highest micro-batch id folded into `table` by a fenced accumulate —
    * `None` before the first fenced fold. Epoch-blind readout of
    * [[foldedFence]], kept for observability.
    */
  def foldedBatchMax(spark: SparkSession, table: String): Option[Long] =
    foldedFence(spark, table).map(_.batchId)

  /** True iff micro-batch `batchId` is already folded into `table` UNDER
    * THE SAME EPOCH: the at-least-once redelivery fence. Valid under the
    * family's single-writer contract with MONOTONICALLY increasing batch
    * ids within an epoch — exactly what Structured Streaming's
    * `foreachBatch` guarantees for one query on one checkpoint (a crash
    * replays the LAST id, never an older one).
    *
    * The EPOCH closes the fresh-checkpoint hole: a query restarted with a
    * new checkpoint restarts batch ids at 0, and an id-only fence would
    * wrongly read its first batches as already-folded — silently dropping
    * data on the exact recovery event fencing exists for. Scope the fence
    * to the checkpoint's identity ([[checkpointEpoch]], or any string that
    * changes when the checkpoint does) and a new epoch is never fenced by
    * an old one's ids; its first fold REPLACES the fence record. Epochs
    * must match exactly, with ONE deliberate asymmetry for upgrades: an
    * epoch-SCOPED caller IS fenced by a legacy epoch-less record (the
    * pre-epoch deployment was the same single writer with monotone ids —
    * adopting the epoch on an unwiped checkpoint must not re-fold the
    * replayed last batch; the first new fold upgrades the record to the
    * epoch). The reverse does not hold: an epoch-less caller is never
    * fenced by an epoch-scoped record (it cannot prove it is the same
    * query). A table must still be fed by ONE streaming query at a time.
    */
  def alreadyFolded(spark: SparkSession, table: String, batchId: Long,
                    epoch: Option[String] = None): Boolean =
    foldedFence(spark, table).exists(f =>
      (f.epoch == epoch || (f.epoch.isEmpty && epoch.nonEmpty)) &&
        batchId <= f.batchId)

  /** The fence EPOCH of a Structured Streaming checkpoint: the query id
    * from `<checkpointLocation>/metadata`, which Spark persists on first
    * start and reuses across restarts of the SAME checkpoint — and
    * regenerates for a FRESH one. Passing this as the `epoch` of the
    * fenced accumulates makes redelivery fencing survive restarts while a
    * checkpoint wipe (the id restart event) correctly voids the fence.
    * `None` until the query has started once (no metadata yet) — callers
    * inside `foreachBatch` are safe: the file exists before any batch runs.
    */
  def checkpointEpoch(spark: SparkSession, checkpointLocation: String): Option[String] = {
    val fs = fsOf(spark, checkpointLocation)
    val f = new Path(checkpointLocation, "metadata")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val txt =
        try org.apache.commons.io.IOUtils.toString(in,
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      // {"id":"<uuid>"} — extract without a JSON dep on this hot path
      "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    }
  }

  /** Version numbers of the retained COMPLETE versions, ascending — the
    * time-travel catalog. What is listable is readable: the same
    * `_SUCCESS`-gated scan [[snapshot]] anchors on.
    */
  def versions(spark: SparkSession, table: String): Seq[Int] =
    completeVersions(fsOf(spark, table), table).map(_._1)

  /** Time-travel read: the table AS OF published version `n`. Version dirs
    * are immutable, so this is a plain scan of `<table>__v<n>` — no log
    * replay, no reconstruction — valid for as long as retention keeps the
    * version (raise `retainVersions` on the write side to lengthen the
    * queryable history). Fails loudly when `n` was never published or has
    * aged out, naming the versions that ARE available.
    */
  def readVersion(spark: SparkSession, table: String, n: Int): DataFrame = {
    val have = completeVersions(fsOf(spark, table), table)
    have.find(_._1 == n) match {
      case Some((_, p)) => spark.read.parquet(p.toString)
      case None => sys.error(
        s"UpsertSink.readVersion: version $n not retained at $table " +
          s"(available: ${have.map(_._1).mkString("[", ", ", "]")})")
    }
  }

  private def localFile(path: String): Option[java.nio.file.Path] = {
    val uri = new Path(path).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  private def isSymlink(path: String): Boolean =
    localFile(path).exists(java.nio.file.Files.isSymbolicLink)

  /** Atomically repoint the plain-path symlink `table` at `target`.
    * Local-fs only (tests, single-node); on HDFS/S3 readers use
    * [[snapshot]] and this is a no-op.
    */
  private def relink(table: String, target: Path): Unit =
    localFile(table).foreach { link =>
      val real = java.nio.file.Paths.get(target.toUri.getPath)
      val tmp = link.resolveSibling(link.getFileName.toString + "__swap")
      java.nio.file.Files.deleteIfExists(tmp)
      java.nio.file.Files.createSymbolicLink(tmp, real)
      java.nio.file.Files.move(tmp, link,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** Read the current state (highest complete version, or the migration
    * seed dir) — by CONCRETE path, never through the symlink, so the
    * about-to-happen swap cannot disturb the merge's own input.
    */
  private[streaming] def currentState(spark: SparkSession, table: String): Option[DataFrame] =
    snapshotPath(spark, table).map(spark.read.parquet(_))

  /** Publish `merged` as the next version and swap the plain-path pointer.
    * Retention: the newest `retainVersions` COMPLETE versions (including
    * the one just published) are kept; older ones are deleted. The
    * default 2 means an in-flight [[snapshot]] reader of version N
    * survives the publish of N+1 and ages out at N+2; a deployment with
    * longer-running readers raises the knob so a snapshot survives
    * `retainVersions - 1` subsequent publishes.
    */
  private def publish(spark: SparkSession, table: String, merged: DataFrame,
                      retainVersions: Int,
                      foldBatchId: Option[Long] = None,
                      foldEpoch: Option[String] = None): Unit = {
    require(retainVersions >= 1,
      s"retainVersions must be >= 1, got $retainVersions")
    val fs = fsOf(spark, table)
    val versions = completeVersions(fs, table)
    // fence high-water mark, carried forward across EVERY publish so an
    // unfenced compaction between fenced folds cannot drop the record.
    // Within one epoch — or when UPGRADING a legacy epoch-less record to
    // the first epoch-scoped fold (same single-writer lineage, ids stay
    // monotone) — the mark is the max of stored and incoming ids; a fold
    // under a genuinely NEW epoch replaces the record outright (the old
    // epoch's ids are dead — its checkpoint is gone)
    val stored = foldedFence(spark, table)
    val fence: Option[FoldFence] = foldBatchId match {
      case Some(b) => stored match {
        case Some(s) if s.epoch == foldEpoch ||
            (s.epoch.isEmpty && foldEpoch.nonEmpty) =>
          Some(FoldFence(s.batchId max b, foldEpoch))
        case _ => Some(FoldFence(b, foldEpoch))
      }
      case None => stored
    }
    val next = versions.lastOption.map(_._1 + 1).getOrElse(1)
    val nextDir = new Path(s"${table}__v$next")
    // write to a staging dir, add the fence sidecar, then atomic-rename
    // into place: the version becomes visible with data + `_SUCCESS` +
    // fence record all at once (overwrite clears a crashed staging).
    // NOTE this crash-safety claim requires an atomic rename — local fs
    // or HDFS, per the [[FenceFile]] filesystem contract
    val staging = new Path(s"${table}__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    fence.foreach { f =>
      // the sidecar is line-oriented: a newline inside the epoch would
      // silently truncate on read and the stored epoch would never match
      // again (every replay re-folds) — reject at write time
      f.epoch.foreach(e => require(!e.exists(c => c == '\n' || c == '\r'),
        s"fence epoch must not contain line breaks: ${e.replace("\n", "\\n")}"))
      val out = fs.create(new Path(staging, FenceFile), true)
      val payload = f.batchId.toString + f.epoch.fold("")("\n" + _)
      try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // a partial `nextDir` can only be a crashed attempt (no `_SUCCESS`,
    // or the pre-staging layout's direct write): clear it for the rename
    if (fs.exists(nextDir)) fs.delete(nextDir, true)
    if (!fs.rename(staging, nextDir))
      sys.error(s"UpsertSink.publish: rename $staging -> $nextDir failed")
    // one-time migration off the pre-versioned layout: the plain dir was
    // the merge input and v1 is now complete, so it can make way for the
    // symlink (a crash here only interrupts plain-path reads until the
    // next publish; the data is safe in v1)
    val tPath = new Path(table)
    if (fs.exists(tPath) && !isSymlink(table)) fs.delete(tPath, true)
    relink(table, nextDir)
    // `versions` predates `next`: keep the newest retainVersions-1 of them
    versions.dropRight(retainVersions - 1).foreach { case (_, p) =>
      fs.delete(p, true)
    }
  }

  /** Merge one micro-batch into the compacted table at `table`. Safe to
    * call from `foreachBatch` (it is also the whole body of it).
    *
    * The stored table KEEPS the `(versionCol, prioCol)` ordering key, so a
    * later batch — or an at-least-once REDELIVERY of an already-merged
    * row — compares against the stored winner's full key and merges
    * idempotently.
    */
  /** The pre-publish CANDIDATE: current snapshot ∪ batch, merged
    * latest-wins by (version, prio) per key — what the table WOULD become.
    * Exposed so a write-audit-publish flow ([[Wap]]) can validate the
    * candidate before committing it.
    */
  private[streaming] def mergedCandidate(table: String, batch: DataFrame,
                                         keyCols: Seq[String], versionCol: String,
                                         prioCol: String): DataFrame = {
    val spark = batch.sparkSession
    val all = currentState(spark, table) match {
      case Some(cur) => cur.unionByName(batch.select(cur.columns.map(col): _*))
      case None => batch
    }
    val payloadCols = all.columns.filterNot(keyCols.contains).toSeq
    all.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*),
        struct(col(versionCol), col(prioCol))).as("_w"))
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Commit an audited candidate as the next version (the [[Wap]] publish
    * leg — same crash-safe version-dir + symlink swap as [[compactBatch]]).
    */
  private[streaming] def publishMerged(spark: SparkSession, table: String,
                                       merged: DataFrame,
                                       retainVersions: Int = 2,
                                       batchId: Option[Long] = None,
                                       epoch: Option[String] = None): Unit =
    publish(spark, table, merged, retainVersions, batchId, epoch)

  def compactBatch(table: String, batch: DataFrame, keyCols: Seq[String],
                   versionCol: String, prioCol: String,
                   retainVersions: Int = 2): Unit = {
    val spark = batch.sparkSession
    publish(spark, table,
      mergedCandidate(table, batch, keyCols, versionCol, prioCol),
      retainVersions)
  }

  /** Wire a versioned stream into a compacted table: every batch runs
    * [[compactBatch]]. Caller starts/stops the returned writer (and owns
    * the checkpoint location).
    */
  def writer(stream: DataFrame, table: String, keyCols: Seq[String],
             versionCol: String, prioCol: String, retainVersions: Int = 2) =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        compactBatch(table, batch, keyCols, versionCol, prioCol,
          retainVersions)
    }

  /** The INCREMENTAL-MATERIALIZED-VIEW sibling of [[compactBatch]]: the
    * table holds per-key MERGEABLE aggregates (counts re-merge by sum;
    * min/max by min/max), and each micro-batch folds its own partial
    * aggregate in — (table ∪ batch-partial) re-aggregated and published as
    * the next version. The running view is O(keys) on disk no matter how
    * much data has streamed through; only SELF-MERGEABLE metrics belong
    * here (a count, a min — never an avg, which callers derive from
    * sum/count at read time). The batch side must already carry those
    * columns as its partial values.
    *
    * NOTE: unlike [[compactBatch]], a replayed fold is NOT idempotent by
    * construction here (sums re-add) — pass the `foreachBatch` batch id
    * as `batchId` and redelivery becomes a recorded no-op: the id is
    * checked against the table's fence mark before folding and published
    * atomically with the merged state (see [[FenceFile]]/[[alreadyFolded]];
    * single writer, monotone ids — the one-query-one-checkpoint contract).
    * Pass the checkpoint identity as `epoch` ([[checkpointEpoch]]) and the
    * fence also survives the FRESH-checkpoint restart event: the new
    * epoch's ids (restarting at 0) are never fenced by the old one's.
    * Without `batchId` the caller owns exactly-once.
    */
  def accumulateBatch(table: String, batchPartial: DataFrame,
                      keyCols: Seq[String], sumCols: Seq[String],
                      minCols: Seq[String], maxCols: Seq[String],
                      retainVersions: Int = 2,
                      batchId: Option[Long] = None,
                      epoch: Option[String] = None): Unit = {
    val spark = batchPartial.sparkSession
    if (batchId.exists(alreadyFolded(spark, table, _, epoch))) return
    val all = currentState(spark, table) match {
      case Some(cur) =>
        cur.unionByName(batchPartial.select(cur.columns.map(col): _*))
      case None => batchPartial
    }
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++ maxCols.map(c => max(col(c)).as(c))
    val merged = all.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    publish(spark, table, merged, retainVersions, batchId, epoch)
  }
}
