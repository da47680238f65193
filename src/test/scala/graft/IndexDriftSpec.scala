package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, IndexDrift}

/** Pins the drift monitor: hand-computed counters, the strict rational
  * threshold semantics, and the streaming contract — slice counters
  * accumulated through UpsertSink.accumulateBatch equal the batch counters
  * over the union (the sum-mergeable design is the point).
  */
class IndexDriftSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal centroids; vectors either hug one of them (cos = 1) or
  // sit diagonal to both (cos ~ 0.707) or opposite (cos < 0)
  private val c0 = Seq(1.0f, 0.0f)
  private val c1 = Seq(0.0f, 1.0f)

  private def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("id", "embedding")

  test("cellCounters: far = best cosine below tau against EVERY centroid") {
    val rows = Seq(
      1L -> Seq(2.0f, 0.0f),   // cell 0, best 1.0
      2L -> Seq(0.0f, 3.0f),   // cell 1, best 1.0
      3L -> Seq(1.0f, 1.0f),   // diagonal: best ~0.707 -> cell tie? cos equal -> higher cid = 1
      4L -> Seq(-1.0f, -1.0f), // best ~ -0.707 -> far at tau 0.2 (cell 1 by tie rule)
      5L -> Seq(-5.0f, 0.0f)   // cos(c0) = -1, cos(c1) = 0 -> cell 1, far
    ).map { case (i, v) => (i, v) }
    val out = IndexDrift.cellCounters(df(rows), "embedding", Seq(c0, c1),
        tau = 0.2).orderBy("ivf_cell")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0, 1L, 0L), (1, 4L, 2L)), s"counters drifted: $out")
  }

  test("rebuildFlags: strict inequality on the rational threshold, minN gate") {
    val counters = Seq((0, 10L, 2L), (1, 10L, 3L), (2, 4L, 4L)).toDF("ivf_cell", "n", "n_far")
    val flags = IndexDrift.rebuildFlags(counters, minN = 5L, p = 1L, q = 5L)
      .orderBy("ivf_cell").collect().map(_.getBoolean(3)).toSeq
    // cell 0: 5*2 = 1*10 -> NOT strictly above 1/5 -> false
    // cell 1: 5*3 > 10 -> true; cell 2: fraction 1.0 but n < minN -> false
    assert(flags == Seq(false, true, false))
  }

  test("streaming accumulate of slice counters == batch counters over the union") {
    import graft.streaming.UpsertSink
    val all = (0L until 60L).map(i =>
      (i, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat)))
    val cents = Seq(c0, c1)
    val table = java.nio.file.Files
      .createTempDirectory("graft-drift").toString + "/counters"
    // three slices arrive as micro-batches; each contributes its partial
    all.grouped(20).foreach { slice =>
      UpsertSink.accumulateBatch(table,
        IndexDrift.cellCounters(df(slice.toSeq), "embedding", cents, tau = 0.9),
        keyCols = Seq("ivf_cell"), sumCols = Seq("n", "n_far"),
        minCols = Nil, maxCols = Nil)
    }
    val accumulated = spark.read.parquet(table)
      .orderBy("ivf_cell").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = IndexDrift.cellCounters(df(all), "embedding", cents, tau = 0.9)
      .orderBy("ivf_cell").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(accumulated == batch,
      s"accumulated counters diverge from batch: $accumulated vs $batch")
    assert(batch.map(_._2).sum == 60L)
  }
}
