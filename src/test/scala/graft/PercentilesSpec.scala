package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentiles
import graft.operators.Percentiles.Mode

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 100).flatMap(i => Seq(("a", i.toDouble), ("b", (i * 3).toDouble)))
    .toDF("k", "v")

  test("sketch mode within the exactness window returns the ceil(p*n)-th order statistic") {
    val r = Percentiles.grouped(df, Seq("k"), "v", Seq(0.5, 0.9, 0.99), Mode.Sketch(100000))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // n = 100 per group: ceil(.5*100)=50, ceil(.9*100)=90, ceil(.99*100)=99
    assert(r("a") == ((50.0, 90.0, 99.0)))
    assert(r("b") == ((150.0, 270.0, 297.0)))
  }

  test("exact mode interpolates like Spark percentile; n column reports group size") {
    val r = Percentiles.grouped(df, Seq("k"), "v", Seq(0.5), Mode.Exact)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(r("a") == ((50.5, 100L))) // interpolated median of 1..100
    assert(r("b")._2 == 100L)
  }

  test("column names survive non-representable p*100 doubles") {
    val cols = Percentiles.grouped(df, Seq("k"), "v", Seq(0.57, 0.999, 0.25), Mode.Exact)
      .columns.toSeq
    assert(cols == Seq("k", "p57", "p99_9", "p25", "n"),
      s"unexpected columns: $cols") // 0.57*100 is 57.00000000000001 in IEEE
  }

  test("sketch stays within the rank error bound once compression kicks in") {
    val big = (1 to 50000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val acc = 1000 // << n, forces compression; rank error <= n/acc = 50
    val p50 = Percentiles.grouped(big, Seq("k"), "v", Seq(0.5), Mode.Sketch(acc))
      .head().getDouble(1)
    assert(math.abs(p50 - 25000.0) <= 50000.0 / acc + 1,
      s"p50 $p50 outside GK error bound")
  }

  /** The 100 TB reason Sketch mode exists: the exact percentile plans an
    * ObjectHashAggregate buffering every group value; the sketch plans a
    * bounded-size buffer with map-side partial merge.
    */
  test("sketch aggregates partially (map-side), exact buffers objects") {
    val sketchPlan = Percentiles.grouped(df, Seq("k"), "v", Seq(0.5), Mode.Sketch())
      .queryExecution.executedPlan.toString
    assert(sketchPlan.contains("partial_percentile_approx"),
      s"expected partial (map-side) sketch aggregation:\n$sketchPlan")
  }
}
