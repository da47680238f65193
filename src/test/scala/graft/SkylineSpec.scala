package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline operator: brute-force equivalence, dominance soundness and
  * completeness, tie handling, and partition-count independence (the
  * two-phase SFS must not depend on where rows land).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Seq[Long])]): Set[Long] = {
    def dominates(b: Seq[Long], a: Seq[Long]): Boolean =
      b.zip(a).forall { case (x, y) => x >= y } &&
        b.zip(a).exists { case (x, y) => x > y }
    rows.filter { case (_, a) =>
      !rows.exists { case (_, b) => dominates(b, a) }
    }.map(_._1).toSet
  }

  private def run(rows: Seq[(Long, Seq[Long])], parts: Int): Set[Long] = {
    val nd = rows.head._2.length
    val df = rows.map { case (id, ds) => (id, ds(0), if (nd > 1) ds(1) else 0L,
        if (nd > 2) ds(2) else 0L) }
      .toDF("id", "d1", "d2", "d3").repartition(parts)
    Skyline.skyline(df, "id", Seq("d1", "d2", "d3").take(nd))
      .select("id").as[Long].collect().toSet
  }

  test("skyline: randomized brute-force equivalence across partitionings") {
    val rnd = new scala.util.Random(7)
    for (iter <- 1 to 15) {
      val nd = 2 + rnd.nextInt(2) // 2 or 3 dims
      val n = 30 + rnd.nextInt(120)
      // small value range -> plenty of ties and duplicate tuples
      val rows = (0L until n.toLong).map(id =>
        (id, Seq.fill(nd)(rnd.nextInt(8).toLong)))
      val want = brute(rows)
      for (parts <- Seq(1, 3, 8)) {
        assert(run(rows, parts) == want,
          s"iter $iter parts=$parts: skyline != brute force")
      }
    }
  }

  test("skyline: duplicate maximal tuples are ALL kept (neither dominates)") {
    val rows = Seq((1L, Seq(5L, 5L)), (2L, Seq(5L, 5L)), (3L, Seq(1L, 9L)),
      (4L, Seq(0L, 0L)))
    assert(run(rows, 2) == Set(1L, 2L, 3L))
  }

  test("skyline: single dim = all rows tied at the max") {
    val rows = Seq((1L, Seq(7L)), (2L, Seq(7L)), (3L, Seq(3L)))
    assert(run(rows, 2) == Set(1L, 2L))
  }

  test("skyline: null criteria are excluded, not kept by default") {
    val df = Seq((1L, Some(5L), Some(5L)), (2L, None, Some(9L)),
        (3L, Some(1L), Some(1L)))
      .toDF("id", "d1", "d2")
    val got = Skyline.skyline(df, "id", Seq("d1", "d2"))
      .select("id").as[Long].collect().toSet
    // row 2's null d1 removes it; row 3 is dominated by row 1
    assert(got == Set(1L))
  }

  test("skyline: anti-correlated chain keeps every row") {
    val rows = (0L until 20L).map(i => (i, Seq(i, 19L - i)))
    assert(run(rows, 4) == rows.map(_._1).toSet)
  }
}
