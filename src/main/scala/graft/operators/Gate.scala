package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-stratum adaptive quality gate — keep each stratum's top fraction by
  * a score column (the "best X% of every domain" curation move; a fixed
  * global threshold would empty weak domains and keep noise from strong
  * ones).
  *
  * Semantics are EXACTLY the rank form `percent_rank() OVER (PARTITION BY
  * stratum ORDER BY v) >= p` (ties share a rank, so equal scores always
  * decide the same way; a singleton stratum keeps its one row) — but the
  * plan is two-pass, not a window:
  *
  *   pass 1: per-stratum threshold t = the ceil(p*(n-1))-th smallest value
  *           (1-based order statistic), via a value->count hash-aggregation
  *           with map-side partial merge (the same buffer shape Spark's own
  *           exact `percentile` uses);
  *   pass 2: broadcast the (stratum, t, n) table — one row per stratum —
  *           and filter map-side: keep iff v > t, or n == 1.
  *
  * Equivalence (why `v > t` IS percent_rank >= p): with ties,
  * percent_rank(v) = cntLess(v)/(n-1), so the keep condition is
  * cntLess(v) >= p*(n-1), i.e. cntLess(v) >= k := ceil(p*(n-1)) since
  * cntLess is an integer (n >= 2, and k >= 1 for p > 0). And
  * cntLess(v) >= k iff v is strictly greater than the k-th smallest value
  * q_(k): if v > q_(k) the k values at sorted positions 1..k are all < v;
  * conversely cntLess(v) >= k puts q_(k) among the values below v. Hence
  * keep iff v > q_(ceil(p*(n-1))). For p = 0.5 this is the familiar
  * floor(n/2)-th smallest. p must be DYADIC so p*(n-1) is exact in double
  * arithmetic in every engine (the same rule as the sampling rates).
  *
  * A `percent_rank` window sorts every stratum's full score distribution
  * inside ONE task — the one-task-per-source scale killer when a source
  * holds billions of rows. The two-pass form shuffles one value->count map
  * per (stratum, partition) and filters in the scan stage.
  *
  * Rows with a null score are never kept and do not count toward n (the
  * rank form's null ordering is engine-dependent; the gate makes it
  * explicit instead).
  *
  * At 100 TB, route the threshold through [[Percentiles.Mode.Sketch]]:
  * `percentile_approx(v, p)` bounds the per-group state at the sketch
  * accuracy instead of the distinct-value count, at the cost of an
  * approximate (but still tie-stable: the decision depends only on v)
  * boundary — mirroring the q36/q51 exact/sketch routing.
  */
object Gate {

  /** Exact rank boundary: the ceil(p*(n-1))-th smallest value (1-based),
    * None for groups smaller than 2. Buffer is a value->count map — merged
    * map-side, bounded by the group's DISTINCT value count (score functions
    * are typically heavily tied), the same state shape as Spark's exact
    * Percentile aggregate.
    */
  class RankBoundary(p: Double) extends Aggregator[Double, Map[Double, Long], Option[Double]] {
    require(p > 0.0 && p < 1.0, s"fraction must be in (0, 1), got $p")
    def zero: Map[Double, Long] = Map.empty
    def reduce(b: Map[Double, Long], a: Double): Map[Double, Long] =
      b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(b1: Map[Double, Long], b2: Map[Double, Long]): Map[Double, Long] =
      b2.foldLeft(b1) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
    def finish(m: Map[Double, Long]): Option[Double] = {
      val n = m.valuesIterator.sum
      if (n < 2) None
      else {
        // exact for dyadic p while n < 2^50; >= 1 because p > 0 and n >= 2
        val k = math.ceil(p * (n - 1)).toLong
        val vals = m.keys.toArray
        java.util.Arrays.sort(vals)
        var cum = 0L
        var i = 0
        while (cum < k) { cum += m(vals(i)); i += 1 }
        Some(vals(i - 1))
      }
    }
    def bufferEncoder = ExpressionEncoder[Map[Double, Long]]()
    def outputEncoder = ExpressionEncoder[Option[Double]]()
  }

  /** Back-compat name for the p = 0.5 boundary (q64's aggregator). */
  class LowerHalfBoundary extends RankBoundary(0.5)

  /** Keep each stratum's rows with percent_rank >= `p` by `valueCol`
    * (strictly above the rank boundary; singleton strata keep their row).
    * `p` must be dyadic (0.5, 0.25, 0.75, ...) for cross-engine exactness.
    * Column set of `df` is preserved.
    */
  def topFraction(df: DataFrame, strataCol: String, valueCol: String,
                  p: Double,
                  mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame = {
    val rows = df.where(col(valueCol).isNotNull)
    val thr = mode match {
      case Percentiles.Mode.Exact =>
        udaf(new RankBoundary(p), Encoders.scalaDouble)(col(valueCol))
      case Percentiles.Mode.Sketch(acc) =>
        percentile_approx(col(valueCol), lit(p), lit(acc))
    }
    val th = rows
      .groupBy(col(strataCol).as("__graft_gate_stratum"))
      .agg(thr.as("__graft_gate_thr"), count(lit(1)).as("__graft_gate_n"))
    rows
      .join(broadcast(th), col(strataCol) <=> col("__graft_gate_stratum"))
      .where(col("__graft_gate_n") === 1 ||
        col(valueCol) > col("__graft_gate_thr"))
      .drop("__graft_gate_stratum", "__graft_gate_thr", "__graft_gate_n")
  }

  /** Keep each stratum's top half by `valueCol` (see [[topFraction]]). */
  def topHalf(df: DataFrame, strataCol: String, valueCol: String,
              mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame =
    topFraction(df, strataCol, valueCol, 0.5, mode)
}
