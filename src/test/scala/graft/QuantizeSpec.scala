package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(0.0f, 0.5f, 1.0f, -1.0f)),
    (2L, Seq(3.25f, 3.25f, 3.25f, 3.25f)), // constant: exact roundtrip
    (3L, Seq(100.0f, -100.0f, 0.001f, 42.0f))
  ).toDF("vec_id", "embedding")

  test("codes are in [0,255]; roundtrip error bounded by scale/2") {
    val codes = Quantize.sq8Codes(vecs, "vec_id", "embedding").collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.forall(c => c >= 0 && c <= 255), s"codes out of range: $cs")
    }
    val rep = Quantize.sq8Report(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    rep.foreach { case (id, (scale, maxErr, cosd)) =>
      assert(maxErr <= scale / 2 + 1e-12, s"vec $id: err $maxErr > scale/2 $scale")
      assert(cosd > 0.999, s"vec $id: cosine drift too large: $cosd")
    }
  }

  test("SQ8 search with full-coverage rerank equals exact top-k") {
    val n = 200
    val corpus = (0 until n).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 13 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq.tabulate(8)(j => math.cos(j * 3).toFloat)
    val exact = graft.operators.Ann.topK(corpus, "vec_id", "embedding", q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val sq8 = graft.operators.Quantize.topKSq8(
        graft.operators.Quantize.withSq8(corpus, "embedding"),
        "vec_id", "embedding", q, k = 10, rerankFactor = n / 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(sq8 == exact, s"full-probe SQ8 must equal exact: $sq8 vs $exact")
    // and at a small rerank budget the approximate pass still finds most
    val tight = graft.operators.Quantize.topKSq8(
        graft.operators.Quantize.withSq8(corpus, "embedding"),
        "vec_id", "embedding", q, k = 10, rerankFactor = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(tight.intersect(exact.toSet).size >= 8,
      s"recall@10 under tight rerank too low: $tight vs $exact")
  }

  test("constant vector: scale 1, codes 0, exact reconstruction") {
    val r = Quantize.sq8Report(vecs.where(col("vec_id") === 2),
      "vec_id", "embedding").head()
    assert(r.getDouble(3) == 1.0) // scale
    assert(r.getDouble(4) == 0.0) // max_err
    assert(r.getDouble(5) == 1.0) // cosine
    val c = Quantize.sq8Codes(vecs.where(col("vec_id") === 2),
      "vec_id", "embedding").head().getSeq[Int](1)
    assert(c.forall(_ == 0))
  }
}
