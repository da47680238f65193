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

  /** Per-stratum quantile BOUNDARIES at j/bins for j = 1..bins-1 — the
    * multi-cut generalization of [[RankBoundary]] from the same one-pass
    * value->count buffer: boundary_j = the ceil(j*(n-1)/bins)-th smallest
    * value (1-based; ALL-INTEGER ceil, no float division). Empty for
    * groups smaller than 2. The cut indices are nondecreasing, so one
    * forward walk over the sorted distinct values yields every boundary.
    */
  class BinBoundaries(bins: Int) extends Aggregator[Double, Map[Double, Long], Seq[Double]] {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    def zero: Map[Double, Long] = Map.empty
    def reduce(b: Map[Double, Long], a: Double): Map[Double, Long] =
      b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(b1: Map[Double, Long], b2: Map[Double, Long]): Map[Double, Long] =
      b2.foldLeft(b1) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
    def finish(m: Map[Double, Long]): Seq[Double] = {
      val n = m.valuesIterator.sum
      if (n < 2) Seq.empty
      else {
        val vals = m.keys.toArray
        java.util.Arrays.sort(vals)
        val out = new Array[Double](bins - 1)
        var i = 0
        var cum = 0L
        var j = 1
        while (j < bins) {
          val k = (j.toLong * (n - 1) + bins - 1) / bins // >= 1 since n >= 2
          while (cum < k) { cum += m(vals(i)); i += 1 }
          out(j - 1) = vals(i - 1)
          j += 1
        }
        out.toSeq
      }
    }
    def bufferEncoder = ExpressionEncoder[Map[Double, Long]]()
    def outputEncoder = ExpressionEncoder[Seq[Double]]()
  }

  /** Assign every non-null-score row its per-stratum quantile bin
    * 0..bins-1 (appended as `bin`) — curriculum phases / difficulty tiers
    * without a global or per-stratum sort. bin(v) = #{ j in 1..bins-1 :
    * v > boundary_j }, which equals the rank form
    * `least(floor(cntLess(v)*bins/(n-1)), bins-1)`: per cut j the
    * [[topFraction]] argument gives v > q_(k_j) iff cntLess(v) >= k_j iff
    * cntLess(v)*bins >= j*(n-1) — all-INTEGER comparisons, so unlike the
    * dyadic-p rule on [[topFraction]] ANY bin count is cross-engine exact.
    * Singleton strata get bin 0; ties share a bin (the decision depends
    * only on v); null-score rows are dropped (unrankable — the same rule
    * as [[topFraction]] never keeping them).
    *
    * Plan: pass 1 aggregates the boundary array per stratum (value->count
    * map buffer, map-side partial merge); pass 2 broadcasts the
    * one-row-per-stratum boundary table and computes the bin MAP-SIDE as an
    * in-row filter-count over the (bins-1)-element array. No WindowExec —
    * a `ntile`/`percent_rank` window sorts each stratum's full score
    * distribution in one task, the per-source scale killer [[topFraction]]
    * exists to avoid.
    *
    * At 100 TB route `mode = Sketch`: percentile_approx at the j/bins
    * percentiles bounds per-group state at the sketch accuracy; boundaries
    * become approximate but the assignment stays tie-stable.
    */
  def quantileBins(df: DataFrame, strataCol: String, valueCol: String,
                   bins: Int,
                   mode: Percentiles.Mode = Percentiles.Mode.Exact): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val rows = df.where(col(valueCol).isNotNull)
    val bnd = mode match {
      case Percentiles.Mode.Exact =>
        udaf(new BinBoundaries(bins), Encoders.scalaDouble)(col(valueCol))
      case Percentiles.Mode.Sketch(acc) =>
        percentile_approx(col(valueCol),
          array((1 until bins).map(j => lit(j.toDouble / bins)): _*), lit(acc))
    }
    val th = rows
      .groupBy(col(strataCol).as("__graft_bins_stratum"))
      .agg(bnd.as("__graft_bins_bnd"))
    rows
      .join(broadcast(th), col(strataCol) <=> col("__graft_bins_stratum"))
      .withColumn("bin",
        size(filter(col("__graft_bins_bnd"), t => col(valueCol) > t)).cast("int"))
      .drop("__graft_bins_stratum", "__graft_bins_bnd")
  }

  /** SOURCE-level reputation gate (the C4/RefinedWeb domain-blocklist move):
    * judge each SOURCE by its corpus-wide statistics and drop whole sources,
    * as opposed to [[topHalf]]'s doc-level gating WITHIN a source. A spammy
    * domain's individually-plausible pages survive per-doc gates; its
    * aggregate signature (short average length, high short-doc share) does
    * not.
    *
    * Verdict per source: keep iff avg_chars >= minAvgChars AND
    * short_frac <= maxShortFrac (a doc is "short" below shortChars chars).
    * Both stats are integer aggregates with ONE division each — exact
    * counts, one correctly-rounded double op — so the verdict is
    * deterministic and the gate hash-stable.
    *
    * Shape: one per-source hash aggregate (map-side partial over however
    * many partitions the source spans — never a per-source task), then the
    * source-count-bounded verdict table joins back as a BROADCAST and the
    * doc filter runs map-side. Returns the verdict table; [[applyReputation]]
    * filters a corpus by it.
    */
  /** The sum-mergeable half of [[sourceReputation]]: per-source counts.
    * All three columns merge by ADDITION, so partials from document
    * slices (or streaming micro-batches — q182) accumulate into exactly
    * the whole-corpus aggregate.
    */
  def reputationAggregate(docs: DataFrame, sourceCol: String,
                          charsCol: String, shortChars: Long): DataFrame =
    docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("tot_chars"),
        sum(when(col(charsCol) < shortChars, 1L).otherwise(0L)).as("n_short"))

  /** Verdicts from an (accumulated) [[reputationAggregate]]. */
  def reputationVerdicts(agg: DataFrame, minAvgChars: Double,
                         maxShortFrac: Double): DataFrame =
    agg
      .withColumn("avg_chars",
        col("tot_chars").cast("double") / col("n_docs").cast("double"))
      .withColumn("short_frac",
        col("n_short").cast("double") / col("n_docs").cast("double"))
      .withColumn("keep",
        col("avg_chars") >= lit(minAvgChars) && col("short_frac") <= lit(maxShortFrac))
      .drop("tot_chars", "n_short")

  def sourceReputation(docs: DataFrame, sourceCol: String, charsCol: String,
                       minAvgChars: Double, maxShortFrac: Double,
                       shortChars: Long): DataFrame =
    reputationVerdicts(reputationAggregate(docs, sourceCol, charsCol, shortChars),
      minAvgChars, maxShortFrac)

  /** Map-side corpus filter by a [[sourceReputation]] verdict table. */
  def applyReputation(docs: DataFrame, verdicts: DataFrame,
                      sourceCol: String): DataFrame =
    docs.join(broadcast(verdicts.where(col("keep")).select(col(sourceCol))),
      Seq(sourceCol))
}
