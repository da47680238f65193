package graft

import graft.operators.PageRank

/** PageRank: exact equivalence with a driver-side reference that
  * replays the SAME float op order (pinned in-neighbor fold by src id),
  * dangling-mass contract, and partition-count independence.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's documented op sequence, replayed in plain Scala:
    * teleport/N + damping·(src-ascending left fold of pr/outdeg).
    */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = nodes.map(v => v -> 1.0 / n.toDouble).toMap
    for (_ <- 1 to iters) {
      pr = nodes.map { v =>
        val ins = edges.filter(_._2 == v)
          .map(e => (e._1, pr(e._1) / out(e._1).toDouble)).sortBy(_._1)
        var s = 0.0
        ins.foreach(s += _._2)
        v -> (0.15 / n.toDouble + 0.85 * s)
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 4): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pagerank: 3-node cycle+chord matches the reference bit-for-bit per iteration") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    for (iters <- 0 to 3) {
      assert(run(edges, iters) == ref(edges, iters), s"diverged at iters=$iters")
    }
  }

  test("pagerank: dangling node keeps teleport-only rank; mass is not redistributed") {
    val edges = Seq((1L, 2L)) // node 2 dangles
    val got = run(edges, 2)
    assert(got == ref(edges, 2))
    // node 1 has no in-edges: rank = 0.15/2 exactly, both iterations
    assert(got(1L) == 0.15 / 2.0)
    // total mass < 1: the dangling contract
    assert(got.values.sum < 1.0)
  }

  test("pagerank: randomized graphs, partition-count independent, exact vs reference") {
    val rnd = new scala.util.Random(11)
    for (iter <- 1 to 8) {
      val nNodes = 5 + rnd.nextInt(20)
      val edges = (for {
        s <- 0L until nNodes.toLong
        d <- 0L until nNodes.toLong
        if s != d && rnd.nextInt(4) == 0
      } yield (s, d)).toSeq
      if (edges.nonEmpty) {
        val want = ref(edges, 3)
        assert(run(edges, 3, parts = 1) == want, s"iter $iter parts=1")
        assert(run(edges, 3, parts = 7) == want, s"iter $iter parts=7")
      }
    }
  }

  test("pagerank: empty edges rejected; iters=0 is uniform 1/N") {
    intercept[IllegalArgumentException] {
      PageRank.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), 1)
    }
    val got = run(Seq((1L, 2L), (3L, 2L)), 0)
    assert(got == Map(1L -> 1.0 / 3.0, 2L -> 1.0 / 3.0, 3L -> 1.0 / 3.0))
  }

  /** PPR reference: same op order, restart vector on seeds only. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
                     iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val nS = seeds.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    def mass(v: Long, per: Double) = if (seeds(v)) per else 0.0
    var pr = nodes.map(v => v -> mass(v, 1.0 / nS)).toMap
    for (_ <- 1 to iters) {
      pr = nodes.map { v =>
        val ins = edges.filter(_._2 == v)
          .map(e => (e._1, pr(e._1) / out(e._1).toDouble)).sortBy(_._1)
        var s = 0.0
        ins.foreach(s += _._2)
        v -> (mass(v, 0.15 / nS) + 0.85 * s)
      }.toMap
    }
    pr
  }

  private def runPpr(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     iters: Int): Map[Long, Double] =
    PageRank.personalizedPageRank(edges.toDF("src", "dst").repartition(4),
        seeds, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("ppr: matches the reference replay; proximity beats centrality") {
    // line graph 1-2-3-4 (symmetric): seed at 1 must rank 2 above 3 above 4,
    // while global pagerank ranks the middle nodes highest
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    for (iters <- 0 to 3)
      assert(runPpr(edges, Seq(1L), iters) == refPpr(edges, Set(1L), iters),
        s"diverged at iters=$iters")
    // NOTE not full hop-monotonicity: at 3 iterations the walk's parity
    // oscillation can rank 4 above 3 — only the 1-hop neighbor's
    // dominance over the far nodes is iteration-count-robust
    val ppr = runPpr(edges, Seq(1L), 3)
    assert(ppr(2L) > ppr(3L) && ppr(2L) > ppr(4L),
      "the seed's neighbor dominates the far nodes")
    val global = run(edges, 3)
    assert(global(2L) > global(1L), "global centrality favors the middle")
  }

  test("ppr: nodes unreachable from the seeds stay at exactly 0") {
    // two components; seed in the first
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val ppr = runPpr(edges, Seq(1L), 3)
    assert(ppr(10L) == 0.0 && ppr(11L) == 0.0)
    assert(ppr(1L) > 0.0 && ppr(2L) > 0.0)
  }

  test("ppr: multi-seed restart splits mass 1/|S| per seed") {
    val edges = Seq((1L, 2L), (3L, 2L))
    val got = runPpr(edges, Seq(1L, 3L), 0)
    assert(got == Map(1L -> 0.5, 2L -> 0.0, 3L -> 0.5))
    assert(runPpr(edges, Seq(1L, 3L), 2) ==
      refPpr(edges, Set(1L, 3L), 2))
  }
}
