package graft

import graft.operators.KCore

/** k-core peeling: closed forms (clique survives, chain/star dissolve,
  * cascade peeling), brute-force fixpoint equivalence, contract cases.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 6,
                  parts: Int = 3): Map[Long, Long] =
    KCore.kCore(edges.toDF("id_a", "id_b").repartition(parts), k = k,
      maxRounds = rounds)
      .as[(Long, Long)].collect().toMap

  private def bruteFix(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
      val surv = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => surv(p._1) && surv(p._2))
      changed = e2.size != e.size
      e = e2
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
  }

  test("triangle+tail at k=2: triangle survives, tail peels") {
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("star dissolves entirely at k=2") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star, k = 2) === Map.empty)
  }

  test("cascade: removing one leaf triggers multi-round unravel") {
    // path 1-2-3-4-5 plus triangle 5-6-7(-5): at k=2 the path unravels
    // one node per round from the 1-end; triangle stands
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L))
    val got = run(g, k = 2, rounds = 8)
    assert(got === Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("randomized fixpoint equivalence across partitionings") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 8) {
      val n = 10 + rnd.nextInt(15)
      val m = 12 + rnd.nextInt(40)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      for (k <- Seq(2, 3); parts <- Seq(1, 4)) {
        assert(run(edges, k, rounds = 32, parts = parts) === bruteFix(edges, k),
          s"k=$k parts=$parts edges=$edges")
      }
    }
  }

  test("k=1 keeps every non-isolated node; empty input empty; k=0 rejected") {
    val e = Seq((1L, 2L), (3L, 3L)) // 3's self-loop is dropped -> isolated
    assert(run(e, k = 1) === Map(1L -> 1L, 2L -> 1L))
    assert(run(Seq.empty[(Long, Long)], k = 2) === Map.empty)
    intercept[IllegalArgumentException] { run(e, k = 0) }
  }
}
