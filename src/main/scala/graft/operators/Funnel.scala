package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: how many users reach
  * step i, where step i counts only if an instance of its event type occurs
  * STRICTLY after some qualifying instance of step i−1 (the product
  * question behind every conversion dashboard).
  *
  * Semantics are pinned to a TOTAL order: rows are ordered by the given
  * `order` columns, which must end in a tiebreaker that is unique per user
  * (event_id here) — "strictly after" then means "earlier row in that
  * order", so duplicate timestamps cannot flap the result between engines
  * or between runs.
  *
  * Shape: step qualification is a chain of EXCLUSIVE-frame running sums
  * (`rows unbounded preceding .. 1 preceding`) — a row's step-i flag is 1
  * iff a qualifying step-(i−1) row strictly precedes it. All windows share
  * one (user, order) partition+sort, so the whole chain costs a SINGLE
  * shuffle of the events regardless of step count; per-user reduction and
  * the final depth histogram are ordinary hash aggregates. No per-user
  * event list is ever materialized (the state per row is one running
  * counter), so a power user with millions of events costs the same as
  * anyone else.
  */
object Funnel {

  /** Per-user step flags `reached_1 .. reached_n` (1/0). */
  def userFlags(events: DataFrame, user: String, typeCol: String,
                steps: Seq[String], order: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val w = Window.partitionBy(col(user)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = steps.zipWithIndex.tail.foldLeft(
      events.withColumn("__q0",
        when(col(typeCol) === steps.head, 1).otherwise(0))) {
      case (df, (st, i)) =>
        df.withColumn(s"__q$i",
          when(col(typeCol) === st && sum(col(s"__q${i - 1}")).over(w) > 0, 1)
            .otherwise(0))
    }
    val aggs = steps.indices.map(i => max(col(s"__q$i")).as(s"reached_${i + 1}"))
    flagged.groupBy(col(user)).agg(aggs.head, aggs.tail: _*)
  }

  /** Depth histogram: (depth, n_users) where depth = number of consecutive
    * steps completed counting from step 1 (a later step reached without
    * its predecessor is impossible by construction).
    */
  def depthHistogram(events: DataFrame, user: String, typeCol: String,
                     steps: Seq[String], order: Seq[String]): DataFrame = {
    val flags = userFlags(events, user, typeCol, steps, order)
    val depth = steps.indices.map(i => col(s"reached_${i + 1}"))
      .reduce[Column](_ + _)
    flags.select(depth.as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
  }

  /** Per-entity step flags PLUS the first qualifying instant of each step
    * (`t_i` = min order-column value over the step's qualifying rows;
    * null when the step was not reached) — the input to time-to-convert
    * analyses. `timeCol` must be the first `order` column (integer event
    * time). Same single-shuffle shape as [[userFlags]]: the mins ride the
    * SAME per-entity hash aggregate as the flag maxes.
    */
  def stepTimes(events: DataFrame, user: String, typeCol: String,
                steps: Seq[String], order: Seq[String],
                timeCol: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val w = Window.partitionBy(col(user)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = steps.zipWithIndex.tail.foldLeft(
      events.withColumn("__q0",
        when(col(typeCol) === steps.head, 1).otherwise(0))) {
      case (df, (st, i)) =>
        df.withColumn(s"__q$i",
          when(col(typeCol) === st && sum(col(s"__q${i - 1}")).over(w) > 0, 1)
            .otherwise(0))
    }
    val aggs = steps.indices.map(i => max(col(s"__q$i")).as(s"reached_${i + 1}")) ++
      steps.indices.map(i =>
        min(when(col(s"__q$i") === 1, col(timeCol))).as(s"t_${i + 1}"))
    flagged.groupBy(col(user)).agg(aggs.head, aggs.tail: _*)
  }
}
