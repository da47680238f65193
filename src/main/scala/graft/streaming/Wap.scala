package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Checks

/** Write-Audit-Publish — the production write path Iceberg popularized as
  * "WAP" and every serious ingestion loop converges on: never let readers
  * see a batch that hasn't passed its quality gates.
  *
  *   1. WRITE: stage the batch against the current snapshot as a merged
  *      CANDIDATE ([[UpsertSink.mergedCandidate]] — latest-wins by
  *      (version, prio) per key);
  *   2. AUDIT: run the declarative [[Checks]] battery over the candidate
  *      (one aggregate per rule, constant-size report);
  *   3. PUBLISH: only if every rule passes, commit the candidate as the
  *      next table version via [[UpsertSink]]'s crash-safe version-dir +
  *      symlink swap. A failed audit leaves the table AT ITS PREVIOUS
  *      VERSION — the bad batch is simply never visible, and the report
  *      says why.
  *
  * The candidate is eagerly checkpointed so audit and publish see the SAME
  * rows (a lazy plan could recompute between the two and — with a
  * non-deterministic source — pass the audit yet publish different data).
  */
object Wap {

  /** Returns the audit report (rule, n_checked, n_violations, pass) plus a
    * `published` column: whether this call committed a new version.
    */
  def publishIfClean(table: String, batch: DataFrame, keyCols: Seq[String],
                     versionCol: String, prioCol: String,
                     rules: Seq[Checks.Rule]): DataFrame = {
    val spark = batch.sparkSession
    val candidate = UpsertSink
      .mergedCandidate(table, batch, keyCols, versionCol, prioCol)
      .localCheckpoint(true)
    try {
      val audit = Checks.report(candidate, rules)
      val rows = audit.collect() // one row per rule — bounded
      val clean = rows.forall(_.getAs[Boolean]("pass"))
      if (clean) UpsertSink.publishMerged(spark, table, candidate)
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
          audit.schema)
        .withColumn("published", lit(clean))
    } finally {
      // release the checkpoint blocks deterministically: a long-running
      // WAP loop would otherwise accrete them in the block manager until
      // the RDD is GC'd and the ContextCleaner catches up
      candidate.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false): Unit
        case _ => ()
      }
    }
  }
}
