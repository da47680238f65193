package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DetMath

/** Kaplan–Meier survival estimation (right-censored) — the
  * time-to-event readout product analytics runs on retention and
  * conversion-lag data: at each distinct death time t,
  *
  *   S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)
  *
  * with d_i deaths at t_i and n_i the at-risk count (everyone whose
  * duration ≥ t_i — censored subjects leave the risk set silently,
  * which is the whole point of the estimator vs a naive conversion
  * curve that treats censoring as non-conversion).
  *
  * Everything reduces to the duration DICTIONARY (one row per distinct
  * duration): at-risk counts are integer prefix sums over it (exact —
  * association-free), and the cumulative product is made bit-portable
  * by routing through the pinned transcendental pair:
  *
  *   S(t) = 2^(−Σ_{t_i ≤ t} g_i),  g_i = lnDet(1/f_i) / LN2
  *
  * ([[DetMath]] — library ln/exp/pow disagree across engines in the
  * last ulp; a product folded in different orders disagrees too). The
  * double prefix sum Σg CANNOT be a window: measured on this host,
  * DuckDB's cumulative window sum is a segment-tree fold, not a left
  * fold, so it would diverge from any sequential sum by ulps. Instead
  * each death row (rank k) explodes j = 1..k and EQUI-joins the
  * contributions (no BNLJ — the range condition becomes a key), and
  * the per-row sum is the usual sorted-list fold both engines replay
  * identically. Cost: T²/2 tiny rows for T distinct death times —
  * the dictionary square, never the subject square.
  *
  * The one boundary: d = n at some t (everyone remaining dies — only
  * possible at the curve's end) makes f = 0; that row reports
  * surv = 0 directly and never enters the log chain.
  */
object Survival {

  /** `subjects`: one row each, with an integer duration column and a
    * 0/1 event column (1 = death observed, 0 = censored at duration).
    * Output: one row per distinct DEATH time — (t, n_risk, d, surv).
    */
  def kaplanMeier(subjects: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val hist = subjects.where(col(durCol).isNotNull)
      .groupBy(col(durCol).as("t"))
      .agg(count(lit(1)).as("c"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"))
    val wLe = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val deaths = hist
      .withColumn("__cum_le", sum(col("c")).over(wLe))
      .withColumn("n_risk", sum(col("c")).over(wAll) - col("__cum_le")
        + col("c"))
      .where(col("d") > 0)
      .withColumn("__f", lit(1.0) -
        col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("k",
        row_number().over(Window.orderBy(col("t"))).cast("long"))
      .select("t", "n_risk", "d", "__f", "k")

    val live = DetMath.withLnDet(
      deaths.where(col("__f") > lit(0.0))
        .withColumn("__finv", lit(1.0) / col("__f")),
      "__finv", "__lnf")
      .withColumn("g", col("__lnf") / lit(DetMath.Ln2))
    val contrib = live.select(col("k").as("j"), col("g").as("gj"))
    val pref = live
      .withColumn("j", explode(sequence(lit(1L), col("k"))))
      .select(col("t"), col("j"))
      .join(contrib, "j")
      .groupBy(col("t"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("j"), col("gj")))),
        lit(0.0), (acc, s) => acc + s.getField("gj")).as("__gsum"))
    val surv = DetMath.withPow2Decay(
      live.join(pref, "t"), "__gsum", "surv")
      .select("t", "n_risk", "d", "surv")

    val absorbed = deaths.where(col("__f") === lit(0.0))
      .select(col("t"), col("n_risk"), col("d"), lit(0.0).as("surv"))
    surv.unionByName(absorbed)
  }
}
