package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank (Brin/Page '98, the simple power-iteration form) — link
  * analysis over an edge relation: source reputation from citation
  * structure, crawl frontier prioritization, influence ranking over an
  * interaction graph. Fixed iteration count; dangling-node mass is NOT
  * redistributed (the simple variant — documented contract, identical
  * formula in the oracle).
  *
  *   pr_0(v)     = 1/N
  *   pr_{k+1}(v) = 0.15/N + 0.85 · Σ_{u→v} pr_k(u)/outdeg(u)
  *
  * Bit-portability: 1/N and pr/outdeg are single correctly-rounded
  * divides; the in-neighbor sum is an ORDER-PINNED fold (sort by source
  * id, then left-to-right double adds — `list_sum(list(c ORDER BY src))`
  * on the oracle side), so ranks hash-compare across engines. The
  * pinned fold is the cross-engine-determinism price: a production run
  * that only needs within-engine stability would use a plain SUM
  * (map-side partials, no per-node list) — same join/agg shape.
  *
  * Scale shape: per iteration ONE broadcast-or-shuffle join of the edge
  * list against the rank vector (both hash-partitioned by the join key —
  * the exchange is reusable across iterations) + ONE per-destination
  * aggregate whose state is bounded by in-degree. Rounds are fixed, the
  * rank vector is O(V), edges never materialize beyond the one relation.
  */
object PageRank {

  /** Ranks after `iters` power iterations over directed `edges`
    * (columns `src`, `dst`; duplicate edges should be pre-distinct'd by
    * the caller if unintended). Vertex set = every id appearing as
    * src or dst. Output: (node_id, pr).
    *
    * `teleport` is a SEPARATE literal, not `1 - damping`: the float
    * subtraction 1.0 − 0.85 lands one ulp off the parsed literal 0.15,
    * and the oracle writes literals — both engines must fold the same
    * constant bits.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               teleport: Double = 0.15): DataFrame =
    power(edges, iters, damping,
      n => lit(1.0) / lit(n),
      n => lit(teleport) / lit(n))

  /** Personalized PageRank (random walk with restart): the teleport
    * mass lands ONLY on `seeds`, so ranks measure multi-hop proximity
    * to the seed set instead of global centrality — the
    * recommendation/related-items form (run it over a SYMMETRIZED
    * interaction graph or mass drains at the bipartite far side).
    * Same iteration shape, joins, and pinned folds as [[pageRank]];
    * only the restart vector differs (uniform 1/|S| on seeds).
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long], iters: Int,
                           damping: Double = 0.85,
                           teleport: Double = 0.15): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    val nS = seeds.size.toDouble
    def mass(per: Column): Column =
      when(col("node_id").isin(seeds: _*), per).otherwise(lit(0.0))
    power(edges, iters, damping,
      _ => mass(lit(1.0) / lit(nS)),
      _ => mass(lit(teleport) / lit(nS)))
  }

  /** The shared power iteration: `init`/`tele` build the restart
    * vector and per-step teleport term from N (both see `node_id`).
    */
  private def power(edges: DataFrame, iters: Int, damping: Double,
                    init: Double => Column,
                    tele: Double => Column): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true) // the static side of every iteration
    // endpoint set as ONE explode (a union's branches would scan the
    // checkpointed edges twice)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node_id"))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank over an empty edge relation")
    val nD = n.toDouble
    // out-degree attached to the edge list ONCE, outside the loop: left
    // lazy, every iteration re-ran the degree aggregate and its join
    // (iters extra shuffles of O(E) for values that never change)
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint(true)

    var pr = nodes.withColumn("pr", init(nD))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(pr.withColumnRenamed("node_id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") / col("odeg").cast("double")).as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, s) => acc + s.getField("c")).as("s"))
      pr = nodes
        .join(sums.withColumnRenamed("dst", "node_id"), Seq("node_id"), "left")
        .select(col("node_id"),
          (tele(nD) + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        .localCheckpoint(true) // truncate the per-iteration lineage
    }
    pr
  }
}
