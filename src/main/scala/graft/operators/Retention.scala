package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics staple: group users by the
  * week they first appeared (their cohort), then count how many of each
  * cohort are still active k weeks later. The output is the retention
  * matrix (cohort_week × week_offset → distinct active users) a
  * curation pipeline reads the same way: "of the documents first
  * crawled in week W, how many sources still emit them at W+k".
  *
  * Scale shape: the raw event stream is touched ONCE, map-side projected
  * to (user, week) and compacted by a distinct whose partial aggregation
  * dedups before the only event-sized shuffle. Everything downstream —
  * the per-user min (cohort), the offset join, the matrix aggregation —
  * runs on the compacted relation, bounded by users × active-weeks,
  * never by event count. At 100 TB of events that is the difference
  * between one shuffle of the compacted key set and three of the raw
  * stream.
  *
  * All arithmetic is integer (week starts are exact date boundaries,
  * offsets exact multiples of 7 days), so the matrix is bit-portable
  * with no float anywhere.
  */
object Retention {

  /** Retention matrix: (cohort_week yyyy-MM-dd, week_offset, n_users).
    * `tsCol` must be a session-zone timestamp; weeks are ISO
    * Monday-start (`date_trunc('week', ...)` on both engines).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame =
    matrixFromUserWeeks(userWeeks(events, userCol, tsCol))

  /** The compacted (uid, wk) relation — distinct ISO-week activity per
    * user. This IS the retention state: distinct-union mergeable across
    * arbitrary slicings (the streaming accumulate's merge rule), bounded
    * by users × active-weeks.
    */
  def userWeeks(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("uid"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()

  /** Derive the retention matrix from a distinct (uid, wk) relation. */
  def matrixFromUserWeeks(uw: DataFrame): DataFrame = {
    val cohort = uw.groupBy("uid").agg(min(col("wk")).as("cohort_wk"))
    uw.join(cohort, "uid")
      .groupBy(
        date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(wk, cohort_wk) div 7").cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
