package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** OPTIMIZE — small-file compaction as a VERSIONED PUBLISH: rewrite the
  * current version's content into ~`targetBytes` files and publish it
  * through the same crash-safe version-dir + `_SUCCESS` + symlink-swap
  * path every other write uses ([[UpsertSink]]). Content is unchanged;
  * only the layout is. Because compaction IS a publish:
  *  - readers keep snapshot isolation (a pinned [[UpsertSink.snapshot]]
  *    keeps its dir for the retention window; plain-path readers swap
  *    atomically);
  *  - a crash mid-compaction leaves the old version current (no
  *    `_SUCCESS`, no swap) — OPTIMIZE is restartable by construction;
  *  - time travel still sees the pre-compaction version while retained.
  *
  * Why it matters at scale: a streaming upsert cadence of N batches/hour
  * leaves N file sets/hour; scan cost at 100 TB is dominated by file COUNT
  * long before byte count (the q162 postings lesson: open latency per
  * file, footer reads, listing). The target file count comes from the
  * current version's on-disk footprint — a listing, no data read.
  */
object Optimize {

  /** One data pass: read current, round-robin into ceil(bytes/targetBytes)
    * files, publish as the next version. Returns
    * (newVersion, dataFilesBefore, dataFilesAfter).
    */
  def optimize(spark: SparkSession, table: String, targetBytes: Long,
               retainVersions: Int = 2): (Int, Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = UpsertSink.snapshotPath(spark, table).getOrElse(
      sys.error(s"Optimize: no complete version at $table"))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String) = fs.listStatus(new Path(p)).toSeq
      .filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val before = dataFiles(path)
    val bytes = before.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt
    UpsertSink.publishMerged(spark, table,
      spark.read.parquet(path).repartition(n), retainVersions)
    val newPath = UpsertSink.snapshotPath(spark, table).get
    val newVersion = UpsertSink.versions(spark, table).last
    (newVersion, before.size, dataFiles(newPath).size)
  }
}
