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
  private val boundedBroadcastCross = Set("q31_topk_batch")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without cartesian/nested-loop joins") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (boundedBroadcastCross(name)) {
        // allowed ONLY as broadcast of the local query set
        val bnljOk = !plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("LocalTableScan")
        assert(bnljOk, s"$name BNLJ build side is not the local query set:\n$plan")
      } else {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }
}
