package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Bm25, Ltr}

/** LTR feature extraction: candidate set = lexical ∪ dense pool minus
  * self, features equal their gated sources bit-for-bit, labels equal
  * the exact dense top-k.
  */
class LtrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "dup stream fast", 15L),
    (1L, "stream join small", 17L),
    (2L, "vector scan hash", 16L),
    (3L, "dup dup vector", 14L),
    (4L, "merge sort row", 14L),
    (5L, "key value table", 15L)
  ).toDF("doc_id", "text", "n_chars")

  private lazy val emb = Seq.tabulate(6)(i =>
    (i.toLong, Seq.tabulate(4)(j => math.sin(i * 3 + j).toFloat)))
    .toDF("vec_id", "embedding")

  private val q = (1L, Seq("dup", "stream"), Seq(0.5f, 0.1f, -0.2f, 0.9f), 5L)

  private lazy val feats = Ltr.featureTable(docs, emb, "doc_id", "vec_id",
    Seq(q), labelK = 2, densePool = 4).localCheckpoint(true)

  test("candidates = lexical-matched union dense pool, self excluded") {
    val lexIds = Bm25.scoreAll(docs, "doc_id", "text", Seq("dup", "stream"))
      .select("doc_id").as[Long].collect().toSet
    val poolIds = Ann.topK(emb.where(col("vec_id") =!= 5), "vec_id",
        "embedding", q._3, 4)
      .select("vec_id").as[Long].collect().toSet
    val got = feats.select("doc_id").as[Long].collect().toSet
    assert(got == (lexIds ++ poolIds) - 5L, s"got $got")
  }

  test("labels equal the exact dense top-k; features match their gated sources") {
    val want = Ann.topK(emb.where(col("vec_id") =!= 5), "vec_id",
        "embedding", q._3, 2)
      .select("vec_id").as[Long].collect().toSet
    val rows = feats.collect().map(r => r.getLong(1) ->
      (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(rows.filter(_._2._5 == 1).keySet == want, "labels != exact top-k")
    // bm25 matches scoreAll for matched candidates, 0.0 exactly otherwise
    val lex = Bm25.scoreAll(docs, "doc_id", "text", Seq("dup", "stream"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    rows.foreach { case (id, (bm25, cos, dl, nChars, _)) =>
      assert(bm25 == lex.getOrElse(id, 0.0), s"doc $id bm25 drifted")
      assert(dl == 3L && nChars == docs.where(col("doc_id") === id)
        .head().getLong(2))
      assert(!cos.isNaN)
    }
  }

  test("multi-query union carries both qids with independent candidates") {
    val q2 = (2L, Seq("merge"), Seq(-0.3f, 0.8f, 0.2f, 0.1f), 0L)
    val both = Ltr.featureTable(docs, emb, "doc_id", "vec_id",
      Seq(q, q2), labelK = 2, densePool = 3)
    val byQ = both.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L))
    assert(byQ(2L).map(_.getLong(1)).toSet.contains(4L), "q2 must surface doc 4 (merge)")
    assert(!byQ(2L).map(_.getLong(1)).contains(0L), "q2's self id 0 must be excluded")
  }

  test("labelK > densePool rejected") {
    intercept[IllegalArgumentException] {
      Ltr.featureTable(docs, emb, "doc_id", "vec_id", Seq(q),
        labelK = 5, densePool = 3)
    }
  }
}
