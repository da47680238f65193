package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) over integer criteria — multi-criteria
  * curation's "keep every document no other document beats on ALL axes
  * at once" selector (quality vs length vs vocabulary richness, cost vs
  * freshness, ...). Row b dominates row a iff b ≥ a on every dim and
  * b > a on at least one; the skyline is the un-dominated set. All
  * comparisons are integer, so the operator is bit-portable by
  * construction.
  *
  * Algorithm: distributed sort-filter-skyline (SFS — Chomicki et al.,
  * ICDE'03). Key invariant: with integer dims, a strict dominator has a
  * STRICTLY larger dim-sum, so after sorting by dim-sum DESC no row can
  * be dominated by a LATER row — each partition streams once against an
  * append-only frontier (no dominated-entry eviction, memory = O(local
  * frontier), not O(partition)). Phase 2 re-runs the same pass over the
  * union of local frontiers in one task: correct because dominance is
  * transitive, so the global skyline is a subset of every partition's
  * local skyline union.
  *
  * 100 TB posture: phase 1 is map-side (per-partition sort + stream,
  * nothing shuffles the corpus); only the local frontiers — output-bound,
  * typically ≪ input — move to the single phase-2 task. An adversarial
  * anti-correlated corpus can make the frontier itself huge; that cost
  * is the answer's size, not the algorithm's overhead (and phase 2 would
  * shard by one dim's range before the final merge).
  */
object Skyline {

  /** The skyline of `df` maximizing every column in `dims` (all cast to
    * long — the integer contract). Output columns: `idCol`, then `dims`,
    * all long. Rows with a NULL in any dim are excluded up front (a null
    * criterion can neither dominate nor defend).
    */
  def skyline(df: DataFrame, idCol: String, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one criterion column")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df
      .where(dims.map(d => col(d).isNotNull).reduce(_ && _) && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        array(dims.map(d => col(d).cast("long")): _*).as("ds"))
      .withColumn("__s", aggregate(col("ds"), lit(0L), _ + _))

    def pass(ds: Dataset[(Long, Seq[Long], Long)]): Dataset[(Long, Seq[Long], Long)] =
      ds.mapPartitions { it =>
        val frontier = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Long)]
        it.foreach { case row @ (_, dsSeq, _) =>
          val v = dsSeq.toArray
          var dominated = false
          var i = 0
          while (!dominated && i < frontier.length) {
            val f = frontier(i)
            var allGe = true; var oneGt = false; var j = 0
            while (j < v.length) {
              if (f(j) < v(j)) allGe = false
              if (f(j) > v(j)) oneGt = true
              j += 1
            }
            dominated = allGe && oneGt
            i += 1
          }
          if (!dominated) { frontier += v; kept += row }
        }
        kept.iterator
      }

    // phase 1: per-partition sorted stream; phase 2: the same pass over
    // the union of local frontiers in one task
    val local = pass(packed
      .sortWithinPartitions(col("__s").desc, col("id"))
      .as[(Long, Seq[Long], Long)])
    val global = pass(local
      .repartition(1)
      .sortWithinPartitions(col("_3").desc, col("_1"))
      .as[(Long, Seq[Long], Long)])

    global.toDF("id", "ds", "__s")
      .select(col("id").as(idCol) +:
        dims.zipWithIndex.map { case (d, i) => col("ds")(i).as(d) }: _*)
  }
}
