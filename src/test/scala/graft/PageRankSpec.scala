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
}
