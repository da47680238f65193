package graft

import graft.operators.Triangles

/** Triangle counting: closed-form graphs (clique, star, triangle+tail),
  * randomized brute-force equivalence across partitionings, and input
  * canonicalization (reversed/duplicate/self-loop pairs).
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 3)
      : Map[Long, (Long, Long, Double)] = {
    val df = edges.toDF("id_a", "id_b").repartition(parts)
    Triangles.triangleCounts(df)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, d, t, c) => id -> (d, t, c) }.toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val es = e.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = nodes.map(n => n -> e.count(p => p._1 == n || p._2 == n).toLong).toMap
    val tris = for {
      (a, b) <- e; (b2, c) <- e if b2 == b; if es.contains((a, c))
    } yield (a, b, c)
    val tcnt = tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    nodes.map(n => n -> (deg(n), tcnt.getOrElse(n, 0L))).toMap
  }

  test("K4: every node in 3 triangles, coefficient 1.0") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = run(k4)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    got.values.foreach { case (d, t, c) =>
      assert(d === 3L); assert(t === 3L); assert(c === 1.0)
    }
  }

  test("star: hub closes nothing — degree high, zero triangles") {
    val star = (1L to 8L).map(i => (0L, i))
    val got = run(star)
    assert(got(0L) === ((8L, 0L, 0.0)))
    (1L to 8L).foreach(i => assert(got(i) === ((1L, 0L, 0.0))))
  }

  test("triangle with a tail: coefficient drops only for the attachment node") {
    // 1-2-3 triangle, 3-4 tail
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L)._1 === 3L)
    assert(got(3L)._2 === 1L)
    assert(got(3L)._3 === 1.0 * 2.0 / 6.0)
    assert(got(4L) === ((1L, 0L, 0.0)))
  }

  test("reversed, duplicate, and self-loop pairs canonicalize away") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (1L, 3L),
      (5L, 5L))
    val got = run(messy)
    assert(!got.contains(5L)) // self-loop contributes nothing
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) === ((2L, 1L, 1.0))))
  }

  test("randomized brute-force equivalence across partitionings") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val n = 8 + rnd.nextInt(20)
      val m = 10 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = brute(edges)
      for (parts <- Seq(1, 4)) {
        val got = run(edges, parts)
        assert(got.view.mapValues(v => (v._1, v._2)).toMap === want)
        // coefficient is exactly 2t/(d(d-1)) as one double divide
        got.foreach { case (_, (d, t, c)) =>
          val expect = if (d < 2) 0.0 else t.toDouble * 2.0 / (d * (d - 1)).toDouble
          assert(c === expect)
        }
      }
    }
  }
}
