package graft

import graft.operators.Profile
import graft.operators.Profile.DistinctMode

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(13)
    Seq.tabulate(3000)(i =>
      (s"src${i % 3}",
        if (i % 17 == 0) null
        else s"doc content ${rnd.nextInt(400)}")) // ~400 distinct per source
      .toDF("source", "text")
  }

  test("exact profile matches brute force") {
    val got = Profile.summary(docs, Seq("source"), "text", DistinctMode.Exact)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getDouble(6)))
      .toMap
    val rows = docs.collect().map(r => (r.getString(0), r.getString(1)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val texts = g.map(_._2).filter(_ != null)
      val (nr, nn, nd, mn, mx, av) = got(src)
      assert(nr == g.length && nn == texts.length)
      assert(nd == texts.distinct.length)
      assert(mn == texts.map(_.length).min && mx == texts.map(_.length).max)
      assert(av == texts.map(_.length.toLong).sum.toDouble / texts.length)
    }
  }

  test("approx distinct stays within the HLL rsd envelope") {
    val rsd = 0.05
    val approx = Profile.summary(docs, Seq("source"), "text", DistinctMode.Approx(rsd))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Profile.summary(docs, Seq("source"), "text", DistinctMode.Exact)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (src, e) =>
      val a = approx(src)
      assert(math.abs(a - e).toDouble / e <= 4 * rsd,
        s"$src: approx $a vs exact $e outside 4*rsd")
    }
  }

  /** The 100 TB contract: the sketch aggregates partially map-side (one
    * bounded sketch per (group, partition) crosses the wire), while the
    * exact form needs the Expand-based distinct expansion.
    */
  test("approx plans a map-side partial sketch; exact plans Expand") {
    val approxPlan = Profile.summary(docs, Seq("source"), "text", DistinctMode.Approx())
      .queryExecution.executedPlan.toString
    assert(approxPlan.contains("partial_approx_count_distinct"),
      s"expected partial HLL aggregation:\n$approxPlan")
    assert(!approxPlan.contains("Expand"))
    val exactPlan = Profile.summary(docs, Seq("source"), "text", DistinctMode.Exact)
      .queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("Expand") || exactPlan.toLowerCase.contains("distinct"),
      s"expected distinct expansion:\n$exactPlan")
  }
}
