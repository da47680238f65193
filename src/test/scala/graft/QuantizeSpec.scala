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

  test("algebraic approx score equals dequantize-and-fold cosine") {
    // the scan computes cos(q, dq) from codes + (mn, scale, Σc, Σc²)
    // WITHOUT materializing dq — same value as the naive reconstruction
    // up to float reassociation
    val n = 100
    val corpus = (0 until n).map { i =>
      (i.toLong, Seq.tabulate(12)(j => (math.sin(i * 31 + j * 5) * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq.tabulate(12)(j => math.cos(j * 2 + 1).toFloat)
    val qd = q.map(_.toDouble)
    val qn = math.sqrt(qd.foldLeft(0.0)((a, x) => a + x * x))
    val staged = Quantize.withSq8(corpus, "embedding")
    val got = graft.operators.Quantize.topKSq8(staged, "vec_id", "embedding",
        q, k = n, rerankFactor = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // naive reference: dequantize each row on the driver, cosine, rank
    val want = staged.select("vec_id", "codes", "mn", "scale")
      .collect().map { r =>
        val mn = r.getDouble(2); val s = r.getDouble(3)
        val dq = r.getSeq[Int](1).map(c => mn + c.toDouble * s)
        val dot = dq.zip(qd).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val na = dq.foldLeft(0.0)((a, x) => a + x * x)
        (r.getLong(0), dot / (math.sqrt(na) * qn))
      }
    // the approximate ORDER must agree with the naive reconstruction's
    // order (scores themselves differ only by reassociation noise, so
    // compare through the exact-rerank output: k=n, rerankFactor=1 makes
    // the final order the exact cosine over everything — but the
    // CANDIDATE cut is what the approx pass decides, so rank the naive
    // approx directly too)
    val naiveOrder = want.sortBy { case (id, sc) => (-sc, id) }.map(_._1).toSeq
    val algebraic = staged
      .select("vec_id", "codes", "mn", "scale", "csum", "csum2").collect()
      .map { r =>
        val codes = r.getSeq[Int](1)
        val mn = r.getDouble(2); val s = r.getDouble(3)
        val csum = r.getDouble(4); val csum2 = r.getDouble(5)
        val qdot = codes.zip(qd).foldLeft(0.0)((a, p) => a + p._2 * p._1)
        val num = mn * qd.foldLeft(0.0)(_ + _) + s * qdot
        val den = math.sqrt(12.0 * mn * mn + 2.0 * mn * s * csum +
          s * s * csum2) * qn
        (r.getLong(0), num / den)
      }.toMap
    want.foreach { case (id, naive) =>
      assert(math.abs(algebraic(id) - naive) < 1e-10,
        s"vec $id: algebraic ${algebraic(id)} vs naive $naive")
    }
    assert(got.nonEmpty && naiveOrder.nonEmpty)
  }

  test("csum/csum2 are integer-exact sums of the codes") {
    val staged = Quantize.withSq8(vecs, "embedding")
      .select("vec_id", "codes", "csum", "csum2").collect()
    staged.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(r.getDouble(2) == cs.map(_.toDouble).sum)
      assert(r.getDouble(3) == cs.map(c => c.toDouble * c.toDouble).sum)
    }
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

  // ---- binary (1-bit sign) quantization ----

  test("sign pack: codegen SignPack == driver packSigns; x>0 rule; pad bits zero") {
    // 70 dims forces a 2-word code with 58 pad bits in word 1
    val n = 70
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(n)(j => math.sin(i * 17 + j * 3).toFloat))
    } :+ (99L, Seq.fill(n)(0.0f)) // all-zero: x > 0 false everywhere
    val df = corpus.toDF("vec_id", "embedding")
    val staged = Quantize.withBinary(df, "embedding")
      .select("vec_id", "embedding", "bits").collect()
    staged.foreach { r =>
      val v = r.getSeq[Float](1)
      val bits = r.getSeq[Long](2)
      assert(bits.length == (n + 63) / 64)
      assert(bits == Quantize.packSigns(v),
        s"codegen pack != driver pack at id ${r.getLong(0)}")
      // bit-by-bit against the sign rule, including word-1 padding
      (0 until bits.length * 64).foreach { i =>
        val bit = (bits(i / 64) >>> (i % 64)) & 1L
        val want = if (i < n && v(i) > 0.0f) 1L else 0L
        assert(bit == want, s"bit $i of id ${r.getLong(0)}: $bit != $want")
      }
    }
    assert(staged.find(_.getLong(0) == 99L).get.getSeq[Long](2).forall(_ == 0L))
  }

  test("hamming_dist == count of differing signs (the oracle's CASE fold)") {
    val n = 70
    val corpus = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(n)(j => math.sin(i * 29 + j * 11).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq.tabulate(n)(j => math.cos(j * 7).toFloat)
    val qbits = Quantize.packSigns(q)
    val got = Quantize.withBinary(corpus, "embedding")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.hammingDist(
          col("bits"), typedlit(qbits)).as("h"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](2)
      val naive = v.indices.count(i => (v(i) > 0.0f) != (q(i) > 0.0f))
      assert(r.getInt(1) == naive,
        s"id ${r.getLong(0)}: hamming ${r.getInt(1)} != naive $naive")
    }
  }

  test("binary search with full-coverage rerank equals exact top-k") {
    val n = 200
    val corpus = (0 until n).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 13 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq.tabulate(8)(j => math.cos(j * 3).toFloat)
    val exact = graft.operators.Ann.topK(corpus, "vec_id", "embedding", q, 10)
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bin = Quantize.topKBinary(
        Quantize.withBinary(corpus, "embedding"),
        "vec_id", "embedding", q, k = 10, rerankFactor = n / 10)
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bin == exact, s"full-probe binary must equal exact: $bin vs $exact")
  }

  test("binary tight rerank recovers the true top-k on a clustered corpus") {
    // sign codes keep direction octants only, so their regime is the
    // clustered one (the RECALL.md lesson): dim 64 = 64 bits of code,
    // docs drawn around 4 well-separated centers, query near center 0
    val dim = 64
    def center(c: Int): Seq[Double] =
      Seq.tabulate(dim)(j => math.sin(c * 97 + j * 13))
    val corpus = (0 until 200).map { i =>
      val c = center(i % 4)
      (i.toLong, Seq.tabulate(dim)(j =>
        (c(j) + 0.1 * math.sin(i * 31 + j * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = center(0).map(x => (x + 0.05).toFloat)
    val exact = graft.operators.Ann.topK(corpus, "vec_id", "embedding", q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val tight = Quantize.topKBinary(
        Quantize.withBinary(corpus, "embedding"),
        "vec_id", "embedding", q, k = 10, rerankFactor = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(tight.intersect(exact).size >= 8,
      s"recall@10 under tight rerank too low: $tight vs $exact")
  }
}
