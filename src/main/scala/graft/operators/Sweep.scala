package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval analytics — "how many intervals are open at once"
  * (peak concurrent sessions, connection-pool sizing, overlap audits).
  *
  * The textbook form is a GLOBAL running sum over +1/−1 boundary events —
  * which in Spark is the one window everyone writes first
  * (`Window.orderBy(ts)`, no partition) and the one that moves the whole
  * table into a single task. This operator computes the same prefix sum in
  * TWO LEVELS, the distributed scan primitive: boundaries bucket by a
  * time-derived key; per-bucket delta totals (one small aggregate) prefix-
  * sum on the driver into per-bucket OFFSETS (bucket count ~ time range /
  * width — bounded, like q63's epochs); each bucket then runs its own
  * windowed running sum and adds its offset. No single-partition stage
  * anywhere; bucket width is the parallelism knob (≈ range / cluster
  * width).
  *
  * Boundary semantics: intervals are [start, end) — an interval ending at
  * t does not overlap one starting at t (ends sort before starts at equal
  * t). Per-row prefix values at tied boundaries depend on intra-tie order,
  * so [[maxConcurrency]] exposes the order-INDEPENDENT aggregate: the peak
  * (the post-tie-group prefix is order-free) and the earliest instant it
  * is reached.
  */
object Sweep {

  /** Per-boundary running open-interval count. `bucketUs` buckets the sweep
    * by integer time division. Output: (t, delta, bucket, running).
    */
  def openIntervals(df: DataFrame, startCol: String, endCol: String,
                    bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val bounds = df.select(col(startCol).as("t"), lit(1).as("delta"))
      .where(col("t").isNotNull)
      .unionByName(
        df.select(col(endCol).as("t"), lit(-1).as("delta"))
          .where(col("t").isNotNull))
      .withColumn("bucket", floorDiv(unix_micros(col("t")), lit(bucketUs)))
    // level 1: per-bucket totals -> driver prefix sum -> broadcast offsets
    // (bucket cardinality = time span / width; a collect of that size is
    // the q63-epoch kind of bounded, not corpus-bounded)
    val totals = bounds.groupBy("bucket").agg(sum(col("delta")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets =
      if (totals.isEmpty) Seq.empty[(Long, Long)]
      else totals.map(_._1).zip(
        totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offMap = map(offsets.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*)
    // level 2: per-bucket running sum (window partition = one bucket) + offset
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("running",
      sum(col("delta")).over(w) + coalesce(element_at(offMap, col("bucket")), lit(0L)))
  }

  /** The order-independent summary: peak open-interval count and the
    * earliest boundary instant at which it is reached. The 1-row global
    * max broadcasts back — no global window anywhere.
    */
  def maxConcurrency(df: DataFrame, startCol: String, endCol: String,
                     bucketUs: Long = 86400000000L): DataFrame = {
    val oi = openIntervals(df, startCol, endCol, bucketUs)
      .select(col("t"), col("running"))
    val mx = oi.agg(max(col("running")).as("max_open"))
    oi.crossJoin(broadcast(mx))
      .where(col("running") === col("max_open"))
      .groupBy(col("max_open"))
      .agg(min(col("t")).as("first_peak_ts"))
  }

  private def floorDiv(a: Column, b: Column): Column =
    // exact floor division via (a - pmod(a, b)) / b: the numerator is an
    // exact multiple of b and |quotient| (a bucket id) is far below 2^53,
    // so the double division is exact; pmod keeps it correct for negative
    // epochs (pre-1970), where `div` would truncate toward zero
    (a - pmod(a, b)).divide(b).cast("long")
}
