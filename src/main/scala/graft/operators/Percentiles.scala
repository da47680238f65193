package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped percentiles with an explicit exact/sketch routing — the scale
  * split the reference's own perf playbook prescribes for its analytics
  * queries (`/root/reference/02_method2_manual_vector_embedding.sql:438-442`:
  * pre-aggregate / approximate when the corpus outgrows interactive scans).
  *
  *  - [[Mode.Exact]]: Spark's interpolated `percentile` — an
  *    ObjectHashAggregate holding every group's values in memory. Right for
  *    the correctness oracle and for bounded group sizes; a memory hazard
  *    when a single group can reach billions of rows.
  *  - [[Mode.Sketch]]: `percentile_approx` — a Greenwald-Khanna sketch of
  *    bounded size (~accuracy entries/group) with rank error <= n/accuracy.
  *    Partial sketches merge map-side, so the shuffle carries one sketch per
  *    (group, partition), never the values: this is the 100 TB path.
  *
  * Sketch-mode determinism contract (what lets the driver gate hash-compare
  * it): while a group's row count stays <= accuracy the sketch never
  * compresses, and `percentile_approx` returns exactly the ceil(p*n)-th
  * order statistic — a raw data value, bit-identical to DuckDB's
  * `quantile_disc` (verified empirically for multi-partition merges). Past
  * that size the result is approximate within the error bound and the
  * oracle comparison no longer applies — see SCALE.md §percentiles.
  */
object Percentiles {

  sealed trait Mode
  object Mode {
    case object Exact extends Mode
    final case class Sketch(accuracy: Int = 10000) extends Mode
  }

  // BigDecimal(p) first (shortest decimal representation of the double),
  // THEN scale: BigDecimal(0.57 * 100) is 57.00000000000001 and would leak
  // into the column name
  /** Output column name for percentile p ("p5", "p50", "p99_9") — public so
    * composing operators ([[Winsorize]], [[FeatureScale]]) can address the
    * bands they requested. */
  def bandColName(p: Double): String =
    "p" + (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")

  /** One row per key combination: the requested percentiles plus the group
    * size (`n`), so callers can check the sketch-exactness precondition
    * `n <= accuracy` from the result itself.
    */
  def grouped(df: DataFrame, keyCols: Seq[String], valueCol: String,
              ps: Seq[Double], mode: Mode = Mode.Sketch()): DataFrame = {
    require(ps.nonEmpty, "at least one percentile required")
    val aggs = (mode match {
      case Mode.Exact =>
        ps.map(p => percentile(col(valueCol), lit(p)).as(bandColName(p)))
      case Mode.Sketch(acc) =>
        ps.map(p => percentile_approx(col(valueCol), lit(p), lit(acc)).as(bandColName(p)))
    }) :+ count(lit(1)).as("n")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
