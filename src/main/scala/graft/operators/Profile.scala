package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group corpus profiling — the summary a training-data pipeline runs
  * before and after every dedup/filter stage (row counts, null coverage,
  * content cardinality, length envelope). The reference runs the same kind
  * of corpus audit before serving
  * (`/root/reference/02_method2_manual_vector_embedding.sql:154-162`,
  * `:355-370`); here it is generalized to any (keys, value) pair with an
  * explicit distinct-count routing:
  *
  *  - [[DistinctMode.Exact]]: `countDistinct` — Catalyst plans an Expand +
  *    two-phase aggregation whose shuffle carries one row per distinct
  *    (group, value): exact, but shuffle volume grows with cardinality.
  *    Right for oracles and bounded-cardinality columns.
  *  - [[DistinctMode.Approx]]: `approx_count_distinct` — HLL++ with a fixed
  *    register budget (~1.04/rsd^2), merged map-side, so the shuffle carries
  *    one small sketch per (group, partition) regardless of cardinality:
  *    the 100 TB default. Relative error `rsd` (asserted in ProfileSpec).
  *
  * All other stats are single-pass exact aggregates; the mean length is
  * emitted as sum/count (exact integer sum, one IEEE division) rather than
  * `avg` so the result is bit-portable across engines.
  */
object Profile {

  sealed trait DistinctMode
  object DistinctMode {
    case object Exact extends DistinctMode
    final case class Approx(rsd: Double = 0.05) extends DistinctMode
  }

  def summary(df: DataFrame, keyCols: Seq[String], valueCol: String,
              mode: DistinctMode = DistinctMode.Approx()): DataFrame = {
    val v = col(valueCol)
    val nDistinct = mode match {
      case DistinctMode.Exact     => countDistinct(v)
      case DistinctMode.Approx(r) => approx_count_distinct(v, r)
    }
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      count(v).as("n_nonnull"),
      nDistinct.as("n_distinct"),
      min(length(v)).as("min_len"),
      max(length(v)).as("max_len"),
      (sum(length(v)) / count(v)).as("avg_len"))
  }

  /** Equi-width numeric histogram — the value-distribution half of
    * profiling ([[summary]] covers shape/cardinality, [[Percentiles]]
    * covers order statistics; this is the bucketed view dashboards plot).
    * One hash aggregation on the bucket id (map-side combined, state =
    * bucket count ≤ range/width); rows with null values are dropped (they
    * have no bucket — count them via [[summary]]'s n_rows − n_nonnull).
    *
    * Bit-portability: pick a power-of-two `width` — dividing a double by
    * 2^k only shifts the exponent, so bucket = floor(v / width) is exact
    * on every IEEE engine; min/max carry input values unchanged.
    */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    val v = col(valueCol)
    df.where(v.isNotNull)
      .groupBy(floor(v / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(v).as("min_v"), max(v).as("max_v"))
      .withColumn("lo", col("bucket").cast("double") * width)
  }
}
