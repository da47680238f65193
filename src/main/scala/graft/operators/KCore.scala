package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (membership for a fixed k) — the density
  * filter of the graph family: the k-core is the maximal subgraph where
  * every node keeps >= k neighbors INSIDE the subgraph. Where triangle
  * counting (q227) scores local closure and components (q62) merely
  * connect, the k-core separates dense template families (which survive
  * peeling) from chains and stars (which dissolve), making it the
  * principled "collapse only the dense part" selector for near-dup
  * cluster curation.
  *
  * Algorithm: synchronous peeling — drop every node with degree < k,
  * re-derive degrees in the induced subgraph, repeat. Each round is ONE
  * degree agg + two semi-joins on node keys (never all-pairs), and the
  * edge set only shrinks, so round cost is monotonically decreasing;
  * the loop early-exits the first round nothing peels. `maxRounds` is
  * the documented contract (peeling can need O(diameter) rounds on
  * pathological chains): the result is BY DEFINITION the
  * `maxRounds`-step peel, which equals the true k-core whenever the
  * peel has converged — and extra rounds are no-ops after convergence,
  * so an early-exited engine result is identical to the fixed-round
  * replay the oracle runs. Lineage is cut per round with an eager
  * localCheckpoint (the Components loop lesson).
  *
  * All decisions are integer degrees — bit-portable, no fold pinning.
  */
object KCore {

  /** Nodes of the k-core with their within-core degrees
    * (`id`, `core_degree`); nodes peeled out (or isolated) are absent.
    */
  def kCore(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
            k: Int, maxRounds: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    var e = pairs
      .select(least(col(idA), col(idB)).as("a"), greatest(col(idA), col(idB)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = e.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged && nEdges > 0) {
      val surv = degrees(e).where(col("deg") >= k).select(col("id"))
      val e2 = e
        .join(surv.withColumnRenamed("id", "a"), Seq("a"), "leftsemi")
        .join(surv.withColumnRenamed("id", "b"), Seq("b"), "leftsemi")
        .localCheckpoint(true)
      val n2 = e2.count()
      converged = n2 == nEdges
      e = e2
      nEdges = n2
      round += 1
    }
    degrees(e).select(col("id"), col("deg").as("core_degree"))
  }
}
