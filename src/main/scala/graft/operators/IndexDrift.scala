package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF index drift monitoring — the QUALITY half of the index-maintenance
  * loop (the freshness half is `ServingIndex`/`DeltaAnnIndex`): an index
  * whose centroids no longer describe the incoming data still SERVES, it
  * just probes the wrong cells. The observable is assignment quality:
  * per cell, how many vectors landed there, and how many are FAR from
  * every centroid (best cosine < tau). A rising far-fraction = the coarse
  * quantizer has drifted off the data = schedule a re-centroid/rebuild.
  *
  * Everything is integer counters over an exact-float threshold test:
  *  - best-centroid cosine = `greatest()` of the pinned cosine folds
  *    (order-free exact max — no fold pinning needed);
  *  - counts are sum-mergeable, so [[cellCounters]] output feeds
  *    `UpsertSink.accumulateBatch` directly — the streaming form
  *    accumulates per micro-batch with no extra machinery;
  *  - [[rebuildFlags]] compares far/n against a RATIONAL threshold p/q by
  *    integer cross-multiplication (q·far > p·n) — no float division, no
  *    epsilon, identical on any engine.
  *
  * Scale: one map-side projection (centroids ride as literals) + one
  * aggregation keyed by cell (nCells groups). Nothing is corpus-sized
  * after the scan.
  */
object IndexDrift {

  /** Per-cell assignment counters: (cell, n, n_far). `tau` is the
    * best-centroid cosine below which a vector counts as far (poorly
    * described by EVERY centroid, not merely on a cell boundary).
    */
  def cellCounters(df: DataFrame, embCol: String,
                   centroids: Seq[Seq[Float]], tau: Double,
                   assignCol: String = "ivf_cell"): DataFrame = {
    require(centroids.nonEmpty, "cellCounters needs at least one centroid")
    val best: Column = greatest(centroids.map(c =>
      cosineSim(col(embCol), typedlit(c))): _*)
    Ann.withIvfAssignment(df.where(col(embCol).isNotNull), embCol,
        centroids, assignCol)
      .withColumn("__far", when(best < lit(tau), 1L).otherwise(0L))
      .groupBy(col(assignCol))
      .agg(count(lit(1)).as("n"), sum(col("__far")).as("n_far"))
  }

  /** Flag cells needing a rebuild: n >= minN (enough evidence) AND
    * far-fraction strictly above p/q, tested as q·n_far > p·n in exact
    * integer arithmetic. Output: counters + `rebuild` boolean.
    */
  def rebuildFlags(counters: DataFrame, minN: Long,
                   p: Long, q: Long): DataFrame = {
    require(q > 0 && p >= 0, s"threshold p/q must be a ratio, got $p/$q")
    counters.withColumn("rebuild",
      col("n") >= lit(minN) && lit(q) * col("n_far") > lit(p) * col("n"))
  }
}
