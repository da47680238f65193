package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance profile: the smoothed bucket-ratio arithmetic verified
  * against an independent in-memory replica on a corpus small enough to
  * count by hand (buckets included).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta alpha", true),
    (2L, "beta gamma", true),
    (3L, "delta delta gamma", false),
    (4L, "epsilon", false),
    (5L, "alpha delta", false)
  ).toDF("doc_id", "text", "is_target")

  private val B = 64

  /** Independent replica: same md5 bucketing (computed THROUGH Spark's conv
    * to share the hash), counts and ratios in plain Scala.
    */
  private def replica(): Map[Long, (Long, Long, Double, Double)] = {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val tokens = rows.flatMap { case (id, t, tg) => t.split(" ").map(w => (id, w, tg)) }
    val bucketOf = tokens.map(_._2).distinct.map { w =>
      w -> Seq(w).toDF("w").select(Dsir.featureBucket(col("w"), B)).head().getLong(0)
    }.toMap
    val cr = tokens.groupBy(t => bucketOf(t._2)).view.mapValues(_.size.toLong).toMap
    val ct = tokens.filter(_._3).groupBy(t => bucketOf(t._2))
      .view.mapValues(_.size.toLong).toMap
    val nr = tokens.size.toLong
    val nt = tokens.count(_._3).toLong
    def ratio(b: Long): Double =
      ((ct.getOrElse(b, 0L) + 1L) * (nr + B)).toDouble /
        ((cr(b) + 1L) * (nt + B)).toDouble
    rows.map { case (id, t, _) =>
      val rs = t.split(" ").map(w => ratio(bucketOf(w)))
      id -> (rs.length.toLong, rs.count(_ > 1.0).toLong, rs.min, rs.max)
    }.toMap
  }

  test("importanceProfile matches the independent replica exactly") {
    val got = Dsir.importanceProfile(docs, col("is_target"), "doc_id", "text", B)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(got == replica())
  }

  test("favored_frac is n_favored / n_tokens and target-only tokens lean target") {
    val out = Dsir.importanceProfile(docs, col("is_target"), "doc_id", "text", B)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out.values.foreach { case (n, f, frac) =>
      assert(frac == f.toDouble / n)
    }
    // beta occurs ONLY in target docs (2 of 11 stream tokens, target = 5):
    // ratio (2+1)(11+64) / ((2+1)(5+64)) = 75/69 > 1 — it must lean target
    assert(out(2L)._2 >= 1L, s"doc 2 contains pure-target token beta, got ${out(2L)}")
    assert(out.values.exists(_._2 > 0), "some token must lean target")
  }

  test("every document keeps a row") {
    val n = Dsir.importanceProfile(docs, col("is_target"), "doc_id", "text", B).count()
    assert(n == 5)
  }
}
