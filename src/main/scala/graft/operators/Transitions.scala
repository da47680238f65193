package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-entity event sequences
  * — the behavioral model behind next-action prediction, anomaly
  * scoring (improbable transitions), and funnel discovery (the funnel
  * operators q164-q183 CHECK a hypothesized step order; the transition
  * matrix FINDS the orders worth hypothesizing).
  *
  * Scale shape: ONE shuffle — the per-entity window (partitionBy
  * entity, orderBy the pinned order) that pairs each event with its
  * successor via `lead`; transition counting is a hash agg over the
  * bounded (state × state) key space, map-side partials doing the
  * heavy lifting. Per-entity state is one row of lookahead, never the
  * sequence.
  *
  * The order ties are pinned (`orderCols` must be a total order per
  * entity — ts alone is NOT, same-timestamp events would make `lead`
  * nondeterministic; callers append the event id). Counts are integer;
  * the transition probability is ONE correctly-rounded division
  * n(a→b) / n(a→*), identical in both engines.
  */
object Transitions {

  /** `(from_state, to_state, n, n_from, p)` for every observed
    * transition; `n_from` counts all transitions leaving `from_state`,
    * so rows with the same `from_state` have probabilities summing to 1
    * (exactly, as rationals).
    */
  def transitionMatrix(df: DataFrame, entityCol: String,
                       orderCols: Seq[Column], stateCol: String): DataFrame =
    matrixFromCounts(transitionCounts(df, entityCol, orderCols, stateCol))

  /** The raw `(from_state, to_state, n)` transition counts — the
    * sum-mergeable half the streaming accumulate stores.
    */
  def transitionCounts(df: DataFrame, entityCol: String,
                       orderCols: Seq[Column], stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    df.where(col(entityCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .select(col(stateCol).as("from_state"), col("__next").as("to_state"))
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
  }

  /** Derive `n_from` and the probability from a counts relation. */
  def matrixFromCounts(counts: DataFrame): DataFrame = {
    val fromTotals = counts.groupBy("from_state").agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(fromTotals), "from_state")
      .select(col("from_state"), col("to_state"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }
}
