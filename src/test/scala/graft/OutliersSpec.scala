package graft

import org.apache.spark.sql.functions.lit

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.operators.{Outliers, Percentiles}

/** Robust median/MAD outlier flags: value semantics on planted anomalies,
  * the MAD=0 degenerate rule, null handling, sketch-mode flag parity, and
  * the two-pass broadcast plan shape (the Gate form, twice).
  */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // group "a" (ODD size, so the interpolated and order-statistic medians
  // coincide — keeps the sketch-parity test honest): tight cluster around
  // 10 plus one wild point; group "b": all identical except one — the
  // MAD=0 degenerate case.
  private lazy val df = Seq(
    (1L, "a", 9.0), (2L, "a", 10.0), (3L, "a", 11.0), (4L, "a", 10.0),
    (5L, "a", 1000.0),
    (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0), (9L, "b", 7.0)
  ).toDF("id", "g", "v")

  test("robustFlags: planted anomaly flagged, cluster not") {
    val out = Outliers.robustFlags(df, "g", "v", z = 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(5L), "the 1000.0 point must flag")
    assert(!out(1L) && !out(2L) && !out(3L) && !out(4L),
      "the tight cluster must not flag")
  }

  test("robustFlags: MAD=0 group flags exactly the rows off the majority value") {
    val out = Outliers.robustFlags(df, "g", "v", z = 3.0)
      .where($"g" === "b").select("id", "is_outlier")
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(6L -> false, 7L -> false, 8L -> false, 9L -> true))
  }

  test("robustFlags: null values are dropped and do not perturb the median") {
    val withNull = df.union(
      Seq((99L, "a")).toDF("id", "g").withColumn("v", lit(null).cast("double"))
        .select("id", "g", "v"))
    val out = Outliers.robustFlags(withNull, "g", "v")
    assert(!out.select("id").as[Long].collect().contains(99L))
    val med = out.where($"id" === 2L).select("group_median").as[Double].head()
    assert(med == 10.0)
  }

  test("robustFlags: sketch mode gives the same flags inside the exactness window") {
    // groups far below the accuracy bound → the GK sketch never compresses
    // and returns an order statistic; with odd-sized value sets (and
    // even-sized deviation sets whose middle pair is tied) that equals the
    // interpolated exact median, so the flags must match exactly
    val e = Outliers.robustFlags(df, "g", "v", 3.0, Percentiles.Mode.Exact)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    val s = Outliers.robustFlags(df, "g", "v", 3.0, Percentiles.Mode.Sketch(1000000))
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(e == s)
  }

  test("robustFlags plan: broadcast joins only, no window/SMJ on the row stream") {
    // sparkPlan (pre-AQE/EnsureRequirements), the PlanAuditSpec convention
    // — exchanges aren't inserted yet at this stage, so pin the JOIN
    // strategy: every join must be a broadcast hash join (the row stream
    // never shuffles for a join) and no window operator sorts a group.
    // 3 BHJs, not 2: the MAD pass re-derives the median join in its agg
    // branch; at runtime ReuseExchange dedups the broadcast.
    val plan = Outliers.robustFlags(df, "g", "v").queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "no per-group window sort")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "row stream must never shuffle for a join")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size == 3,
      "all joins broadcast the small per-group aggregates")
  }
}
