package graft

/** Whole-surface plan regression guard: EVERY query in SparkEntry.queries
  * must plan without a CartesianProduct or BroadcastNestedLoopJoin — the two
  * shapes that silently turn a bounded pair operator into an O(n^2) scan at
  * cluster scale. Manual `.explain` audits caught these per-round; this spec
  * pins the property for all current and future queries at once.
  *
  * Runs against sf0.001 so the handful of queries whose CONSTRUCTION
  * executes small jobs (stored-vector head() lookups, the streaming memory
  * sink, k-means refinement) stay cheap; planning itself never executes the
  * main job.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** q31 deliberately broadcast-cross-joins the BOUNDED query-vector set
    * (k rows, driver-collected literals) against the corpus — that is the
    * batch-scoring contract, and it plans as a BroadcastNestedLoopJoin whose
    * build side must be a local relation, never a scanned table.
    */
  private val boundedBroadcastCross =
    Set("q31_topk_batch", "q204_ir_metrics", "q210_ann_eval", "q214_ir_macro",
      // q229 is topKBatch's shape with the label-exclusion predicate as
      // the join condition — build side is the 2-anchor local relation
      "q229_hard_negatives")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without cartesian/nested-loop joins") {
      import org.apache.spark.sql.catalyst.optimizer.BuildRight
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      val physical = fn(spark, sfDir).queryExecution.sparkPlan
      val plan = physical.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      val bnljs = physical.collect { case b: BroadcastNestedLoopJoinExec => b }
      if (boundedBroadcastCross(name)) {
        // allowed ONLY as a broadcast of the bounded local query set: the
        // BUILD side subtree must contain no file scan
        bnljs.foreach { b =>
          val build = if (b.buildSide == BuildRight) b.right else b.left
          val fileScans = build.collect { case f: FileSourceScanExec => f }
          assert(fileScans.isEmpty,
            s"$name BNLJ broadcasts a scanned table, not the local query set:\n$plan")
        }
      } else {
        assert(bnljs.isEmpty,
          s"$name plans a BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }
}
