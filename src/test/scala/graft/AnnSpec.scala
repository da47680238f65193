package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(200)(i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "emb")
  }

  test("topK equals driver-side sort.take") {
    val q = Seq.fill(12)(0.5f)
    val got = Ann.topK(corpus, "id", "emb", q, 7)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val all = corpus.collect()
      .map(r => (r.getLong(0), Ann.cosine(r.getSeq[Float](1), q)))
      .sortBy(x => (-x._2, x._1)).take(7)
    assert(got.toSeq == all.toSeq)
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "scores must be descending")
  }

  test("topK plans TakeOrderedAndProject (no global sort / shuffle)") {
    val plan = Ann.topK(corpus, "id", "emb", Seq.fill(12)(1f), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("matryoshka: full-coverage rerank == exact topK; scores always the full-dim fold") {
    val q = Seq.tabulate(12)(j => math.sin(j * 0.7).toFloat)
    // rerankFactor covering the whole corpus: the candidate stage cannot
    // lose anything, so the result IS the exact scan
    val full = Ann.topKMatryoshka(corpus, "id", "emb", q, k = 7,
        prefixDim = 4, rerankFactor = 40)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Ann.topK(corpus, "id", "emb", q, 7)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
    // modest pool: the result is exactly "full-dim rerank of the
    // prefix-cosine top-(k·f) pool" — both stages replicated driver-side
    val got = Ann.topKMatryoshka(corpus, "id", "emb", q, k = 5,
        prefixDim = 4, rerankFactor = 3)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val pool = rows.map { case (id, v) =>
        (id, v, Ann.cosine(v.take(4), q.take(4))) }
      .sortBy(x => (-x._3, x._1)).take(15)
    val want = pool.map { case (id, v, _) => (id, Ann.cosine(v, q)) }
      .sortBy(x => (-x._2, x._1)).take(5)
    assert(got.toSeq == want.toSeq)
    // scores are the exact full-dim cosine (never the prefix score)
    val byId = rows.toMap
    got.foreach { case (id, s) =>
      assert(s == Ann.cosine(byId(id), q), s"score of $id is not full-dim") }
    // contracts
    intercept[IllegalArgumentException] {
      Ann.topKMatryoshka(corpus, "id", "emb", q, 5, prefixDim = 0)
    }
    intercept[IllegalArgumentException] {
      Ann.topKMatryoshka(corpus, "id", "emb", q, 5, prefixDim = 13)
    }
    intercept[IllegalArgumentException] {
      Ann.topKMatryoshka(corpus, "id", "emb", q, 5, prefixDim = 4,
        rerankFactor = 0)
    }
  }

  test("topKBatch matches per-query topK") {
    val qs = Seq(
      1L -> Seq.fill(12)(0.3f),
      2L -> Seq.tabulate(12)(i => if (i % 2 == 0) 1f else -1f))
    val batch = Ann.topKBatch(corpus, "id", "emb", qs, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"), r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues(_.sortBy(x => -x._3).map(x => (x._2, x._3)).toSeq).toMap
    qs.foreach { case (qid, q) =>
      val single = Ann.topK(corpus, "id", "emb", q, 5)
        .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"batch vs single mismatch for qid=$qid")
    }
  }

  /** Pins the TopKAgg threshold fast path (stale-k-th-best reject) against
    * driver-side brute force on a corpus large enough to force many trims
    * and many rejections, across several partitions (partial merges).
    */
  test("topKBatch equals brute force on a large random corpus (threshold path)") {
    val rnd = new scala.util.Random(97)
    val big = Seq.tabulate(2000)(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val bigDf = big.toDF("id", "emb").repartition(7)
    val qs = Seq.tabulate(3)(qi => (qi.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val batch = Ann.topKBatch(bigDf, "id", "emb", qs, 9)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"), r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    qs.foreach { case (qid, q) =>
      val brute = big.map { case (id, v) => (id, Ann.cosine(v.toSeq, q)) }
        .sortBy(x => (-x._2, x._1)).take(9)
      assert(batch(qid) == brute, s"qid=$qid:\n got  ${batch(qid)}\n want $brute")
    }
  }

  test("IVF probing: full probe count recovers exact top-k") {
    val cents = Ann.sampleCentroids(corpus, "id", "emb", 4)
    val assigned = Ann.withIvfAssignment(corpus, "emb", cents)
    val q = Seq.fill(12)(0.25f)
    val exact = Ann.topK(corpus, "id", "emb", q, 5).select("id")
      .collect().map(_.getLong(0)).toSet
    val allProbes = Ann.topKIvf(assigned, "id", "emb", "ivf_cell", cents, q, 5, nProbe = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(allProbes == exact)
    val oneProbe = Ann.topKIvf(assigned, "id", "emb", "ivf_cell", cents, q, 5, nProbe = 1)
      .select("id").collect().map(_.getLong(0))
    assert(oneProbe.nonEmpty && oneProbe.length <= 5)
  }

  test("k-means refinement tightens clusters and preserves exact full-probe recall") {
    def cohesion(cents: Seq[Seq[Float]]): Double = {
      val assigned = Ann.withIvfAssignment(corpus, "emb", cents)
      assigned.collect().map { r =>
        Ann.cosine(r.getSeq[Float](1), cents(r.getInt(2)))
      }.sum
    }
    val init = Ann.sampleCentroids(corpus, "id", "emb", 4)
    val refined = Ann.kmeansCentroids(corpus, "id", "emb", 4, iters = 4)
    assert(cohesion(refined) > cohesion(init),
      "refined centroids must increase within-cluster cosine cohesion")
    val q = Seq.fill(12)(0.2f)
    val exact = Ann.topK(corpus, "id", "emb", q, 5).select("id")
      .collect().map(_.getLong(0)).toSet
    val assigned = Ann.withIvfAssignment(corpus, "emb", refined)
    val full = Ann.topKIvf(assigned, "id", "emb", "ivf_cell", refined, q, 5, nProbe = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(full == exact)
  }

  test("farthest-point seeding spreads across clusters where first-n-by-id cannot") {
    // three tight, well-separated direction clusters; ids ordered so the
    // first 100 ids ALL sit in cluster 0 — the bias sampleCentroids carries
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c0 = Array(1f, 0f, 0f, 0f); val c1 = Array(0f, 1f, 0f, 0f)
    val c2 = Array(0f, 0f, 1f, 0f)
    val docs = (Seq.tabulate(100)(i => (i.toLong, jitter(c0))) ++
      Seq.tabulate(100)(i => (100L + i, jitter(c1))) ++
      Seq.tabulate(100)(i => (200L + i, jitter(c2)))).toDF("id", "emb")
    def clustersHit(cents: Seq[Seq[Float]]): Set[Int] =
      cents.map(c => Seq(c0, c1, c2).map(b => Ann.cosine(c, b.toSeq))
        .zipWithIndex.maxBy(_._1)._2).toSet
    assert(clustersHit(Ann.sampleCentroids(docs, "id", "emb", 3)) == Set(0))
    val fp = Ann.farthestPointCentroids(docs, "id", "emb", 3)
    assert(clustersHit(fp) == Set(0, 1, 2))
    // deterministic: same seeds under a different partitioning
    assert(Ann.farthestPointCentroids(docs.repartition(7), "id", "emb", 3) == fp)
    // k above the candidate count would silently emit duplicate centroids;
    // empty input would be an opaque head() error — both fail clearly
    val few = docs.limit(2)
    val eTooMany = intercept[IllegalArgumentException] {
      Ann.farthestPointCentroids(few, "id", "emb", 5)
    }
    assert(eTooMany.getMessage.contains("exceeds"))
    val eEmpty = intercept[IllegalArgumentException] {
      Ann.farthestPointCentroids(docs.where("id < 0"), "id", "emb", 1)
    }
    assert(eEmpty.getMessage.contains("0 rows"))
  }

  test("hyperplane buckets: identical vectors same bucket, opposite differ") {
    val planes = Ann.hyperplanes(4, 8)
    val df = Seq(
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(1f, 2f, 3f, 4f)),
      (3L, Array(-1f, -2f, -3f, -4f))
    ).toDF("id", "emb")
    val buckets = Ann.withHyperplaneBuckets(df, "emb", planes)
      .select("id", "lsh_bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) == buckets(2L))
    assert(buckets(1L) != buckets(3L))
  }

  test("label cohesion: tight label reads ~1.0, scattered label strictly looser") {
    val tight = (1 to 10).map(i => (i.toLong, 0, Array(1f, 2f, 3f, 4f)))
    // scattered: axis-aligned one-hot vectors — pairwise orthogonal, so
    // cosine-to-centroid is well below 1 for every member
    val scattered = (1 to 4).map(i =>
      (100L + i, 1, Array.tabulate(4)(j => if (j == i - 1) 1f else 0f)))
    val df = (tight ++ scattered).toDF("id", "label", "emb")
    val got = Ann.labelCohesion(df, "emb", "label")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(0).getLong(1) == 10)
    assert(math.abs(got(0).getDouble(2) - 1.0) < 1e-6) // identical vectors: min_cos ~ 1
    assert(got(1).getLong(1) == 4)
    assert(got(1).getDouble(3) < 0.9, "orthogonal label should not look cohesive")
    assert(got(1).getDouble(2) <= got(1).getDouble(3))
  }

  // ------------------------------------------------------------------ PQ

  /** 160 vectors in 8 tight clusters (dim 16), L2-normalized — the regime
    * PQ is built for; deterministic seed.
    */
  private lazy val pqCorpus = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat))
    Seq.tabulate(160) { i =>
      val c = centers(i % 8)
      val v = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n).toSeq)
    }.toDF("id", "emb")
  }

  test("pq: encode is a per-row projection with in-range codes") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val books = Ann.pqCodebooks(pqCorpus, "id", "emb", m = 4, ksub = 8)
    assert(books.size == 4 && books.forall(_.size == 8) &&
      books.forall(_.forall(_.size == 4)))
    val coded = Ann.withPqCodes(pqCorpus, "emb", books)
    assert(coded.queryExecution.sparkPlan
      .collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "encoding must not shuffle")
    val codes = coded.select("pq_code").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
  }

  test("pq: ADC candidate scan matches the driver-side table fold") {
    val books = Ann.pqCodebooks(pqCorpus, "id", "emb", m = 4, ksub = 8)
    val q = pqCorpus.where(col("id") === 0).select("emb")
      .head().getSeq[Float](0).toSeq
    // candidates straight from topKPq with rerankFactor covering everything
    // == exact topK: ADC ordering only decides the candidate cut, and a
    // full-coverage cut makes the re-rank the whole corpus
    val got = Ann.topKPq(Ann.withPqCodes(pqCorpus, "emb", books),
        "id", "emb", "pq_code", books, q, k = 10, rerankFactor = 16)
      .select("id").as[Long].collect().toSeq
    val exact = Ann.topK(pqCorpus, "id", "emb", q, 10)
      .select("id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("pq: Lloyd refinement never worsens quantization distortion") {
    def distortion(books: Seq[Seq[Seq[Float]]]): Double = {
      val d = books.head.head.size
      pqCorpus.collect().map { r =>
        val v = r.getSeq[Float](1)
        books.zipWithIndex.map { case (cb, j) =>
          val sub = v.slice(j * d, (j + 1) * d)
          cb.map(c => sub.zip(c).map { case (x, y) =>
            (x.toDouble - y) * (x.toDouble - y) }.sum).min
        }.sum
      }.sum
    }
    val sampled = distortion(Ann.pqCodebooks(pqCorpus, "id", "emb", 4, 8))
    val refined = distortion(Ann.pqCodebooks(pqCorpus, "id", "emb", 4, 8, iters = 3))
    assert(refined <= sampled + 1e-9,
      s"Lloyd worsened distortion: $sampled -> $refined")
  }

  test("pq: refined codebooks + modest rerank recover the exact top-k on clustered data") {
    val books = Ann.pqCodebooks(pqCorpus, "id", "emb", m = 4, ksub = 8, iters = 3)
    val coded = Ann.withPqCodes(pqCorpus, "emb", books)
    val q = pqCorpus.where(col("id") === 3).select("emb")
      .head().getSeq[Float](0).toSeq
    val got = Ann.topKPq(coded, "id", "emb", "pq_code", books, q,
        k = 10, rerankFactor = 4)
      .select("id").as[Long].collect().toSet
    val exact = Ann.topK(pqCorpus, "id", "emb", q, 10)
      .select("id").as[Long].collect().toSet
    val recall = (got & exact).size / 10.0
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("ivf×pq composition: full probe + generous rerank equals exact top-k") {
    // the q45-style recall contract applied to the COMPOSED operator: with
    // every cell probed and a candidate pool large enough to cover the true
    // neighbors, the approximate path must return exactly the brute-force
    // answer (same scores, same tie order)
    val cents = Ann.kmeansCentroids(pqCorpus, "id", "emb", k = 4, iters = 3)
    val books = Ann.pqCodebooks(pqCorpus, "id", "emb", m = 4, ksub = 8, iters = 3)
    val indexed = Ann.withPqCodes(
      Ann.withIvfAssignment(pqCorpus, "emb", cents), "emb", books)
    val q = pqCorpus.where(col("id") === 3).select("emb")
      .head().getSeq[Float](0).toSeq
    val got = Ann.topKIvfPq(indexed, "id", "emb", "ivf_cell", "pq_code",
        cents, books, q, k = 10, nProbe = 4, rerankFactor = 16)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Ann.topK(pqCorpus, "id", "emb", q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("ivf×pq composition: probing actually prunes the candidate scan") {
    val cents = Ann.kmeansCentroids(pqCorpus, "id", "emb", k = 4, iters = 3)
    val books = Ann.pqCodebooks(pqCorpus, "id", "emb", m = 4, ksub = 8)
    val indexed = Ann.withPqCodes(
      Ann.withIvfAssignment(pqCorpus, "emb", cents), "emb", books)
      .localCheckpoint(true)
    val q = pqCorpus.where(col("id") === 3).select("emb")
      .head().getSeq[Float](0).toSeq
    val probed = cents.zipWithIndex
      .map { case (c, i) => (Ann.cosine(q, c), i) }
      .sortBy(x => (-x._1, x._2)).take(1).map(_._2)
    val inCell = indexed.where(col("ivf_cell").isin(probed: _*)).count()
    assert(inCell < indexed.count(),
      "planted clusters must not all land in one cell")
    // nProbe=1 with huge rerank returns exactly the probed cell's rows
    // ranked by exact cosine — proof the other cells were never candidates
    val got = Ann.topKIvfPq(indexed, "id", "emb", "ivf_cell", "pq_code",
        cents, books, q, k = inCell.toInt + 50, nProbe = 1,
        rerankFactor = 1000)
      .count()
    assert(got === inCell)
  }

  test("pickNProbe: smallest probe meeting the target, monotone in the target") {
    val curve = Seq(1 -> 0.22, 2 -> 0.35, 4 -> 0.55, 8 -> 0.82, 16 -> 1.0)
    assert(Ann.pickNProbe(curve, 0.0) == 1)
    assert(Ann.pickNProbe(curve, 0.35) == 2)
    assert(Ann.pickNProbe(curve, 0.5) == 4)
    assert(Ann.pickNProbe(curve, 0.9) == 16)
    // unreachable target -> widest probe (the index is the limiter)
    assert(Ann.pickNProbe(curve :+ (32 -> 0.99), 1.5) == 32)
    // measurement noise (a dip) must not break monotonicity
    val noisy = Seq(1 -> 0.3, 2 -> 0.25, 4 -> 0.6, 8 -> 0.9)
    val targets = Seq(0.1, 0.25, 0.3, 0.5, 0.6, 0.8, 0.9, 0.95)
    val picks = targets.map(Ann.pickNProbe(noisy, _))
    assert(picks == picks.sorted, s"picker not monotone: $targets -> $picks")
    // order of the input curve is irrelevant
    assert(Ann.pickNProbe(curve.reverse, 0.5) == 4)
  }

  test("clustered fixture: deterministic, and cells align with clusters (high recall at narrow probe)") {
    val a = Ann.syntheticClusteredEmbeddings(spark, 200, 16, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = Ann.syntheticClusteredEmbeddings(spark, 200, 16, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a == b, "fixture must be bit-deterministic across runs")
    // same-cluster points are near (cos >> 0), cross-cluster near-orthogonal
    val corpus = Ann.syntheticClusteredEmbeddings(spark, 400, 32, 8,
      spread = 0.4)
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    val byCluster = rows.groupBy(_._2)
    val same = Ann.cosine(byCluster(0).head._3, byCluster(0)(1)._3)
    val cross = Ann.cosine(byCluster(0).head._3, byCluster(1).head._3)
    assert(same > 0.8 && math.abs(cross) < 0.5,
      f"cluster geometry off: same=$same%.2f cross=$cross%.2f")
    // the production claim behind RECALL.md's clustered regime: at
    // nProbe=2 of 8 k-means cells, recall@10 on clustered data is high
    // (vs ~0.35 on the isotropic floor)
    val emb = corpus.select("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 3)
    val indexed = Ann.withIvfAssignment(emb, "embedding", cents)
      .localCheckpoint(true)
    val recalls = Seq(3L, 101L, 250L).map { qid =>
      val qv = rows.find(_._1 == qid).get._3
      val base = indexed.where(col("vec_id") =!= qid)
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = ids(Ann.topK(base, "vec_id", "embedding", qv, 10))
      val probed = ids(Ann.topKIvf(base, "vec_id", "embedding", "ivf_cell",
        cents, qv, 10, nProbe = 2))
      (probed & exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8,
      f"clustered-regime recall@10 at nProbe=2 only $mean%.2f — cells not aligned with clusters")
  }

  test("MaxSim late interaction == naive per-doc max-then-ordered-sum; one shuffle") {
    import spark.implicits._
    val dim = 8
    val rows = (0 until 240).map { i =>
      (i.toLong / 4, i.toLong,
        Seq.tabulate(dim)(j => math.sin(i * 13 + j * 7).toFloat))
    }
    val docs = rows.toDF("doc_id", "part_id", "embedding")
    val qbag = (0 until 3).map(qi =>
      Seq.tabulate(dim)(j => math.cos(qi * 5 + j * 3).toFloat))
    val got = graft.operators.LateInteraction
      .maxSimTopK(docs, "doc_id", "embedding", qbag, 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // naive: same pinned cosine fold, per-(doc, qtok) max, qtok-ordered sum
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < a.length) {
        val x = a(j).toDouble; val y = b(j).toDouble
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.groupBy(_._1).map { case (doc, parts) =>
      val score = qbag.map(qv => parts.map(p => cos(p._3, qv)).max)
        .reduceLeft(_ + _)
      (doc, score)
    }.toSeq.sortBy { case (doc, s) => (-s, doc) }.take(7)
    assert(got == want, s"maxsim drifted: $got vs $want")
    // plan: exactly one exchange (the per-doc hash agg) — the cosines are
    // scan-side columns, not a join or an explode
    val plan = graft.operators.LateInteraction
      .maxSimTopK(docs, "doc_id", "embedding", qbag, 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Generate"),
      s"maxsim plan grew a join/explode:\n$plan")
  }

  test("topKBatchIvf: each query scores only its probed cells, == per-query topKIvf") {
    import spark.implicits._
    val dim = 6
    val rows = (0L until 40L).map(i =>
      (i, Seq.tabulate(dim)(j => math.sin(i * 3 + j).toFloat)))
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = graft.operators.Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
    val indexed = graft.operators.Ann.withIvfAssignment(corpus, "embedding", cents)
    val queries = Seq(5L, 17L, 31L).map(i => i -> rows(i.toInt)._2)
    val batch = graft.operators.Ann.topKBatchIvf(indexed, "vec_id", "embedding",
      "ivf_cell", cents, queries, k = 6, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._3, x._4)).toSeq).toMap
    queries.foreach { case (qid, qv) =>
      val single = graft.operators.Ann.topKIvf(indexed, "vec_id", "embedding",
        "ivf_cell", cents, qv, k = 6, nProbe = 2)
        .select("vec_id", "score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"batched IVF drifted for qid=$qid")
    }
  }

  test("multi-probe LSH: probe set = home + single-bit flips; boundary neighbor recovered") {
    import spark.implicits._
    val planes = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    // query sits just ABOVE the x-axis; its nearest neighbor just BELOW —
    // a different sign bucket on plane 2, invisible to single-bucket LSH
    val q = Seq(1.0f, 0.05f)
    val rows = Seq(
      (1L, Seq(1.0f, -0.04f)), // the true nearest, across the boundary
      (2L, Seq(0.7f, 0.7f)),   // same bucket as the query, further away
      (3L, Seq(-1.0f, 0.5f)),  // two bit flips away — NOT probed
      (4L, Seq(0.9f, 0.3f)))
    val corpus = graft.operators.Ann.withHyperplaneBuckets(
      rows.toDF("vec_id", "embedding"), "embedding", planes)
    // probe set: home bucket (3: both dots >= 0) then flips {2, 1}
    assert(graft.operators.Ann.multiProbeBuckets(q, planes) == Seq(3L, 2L, 1L))
    val single = graft.operators.Ann.topK(corpus, "vec_id", "embedding", q, 2,
        org.apache.spark.sql.functions.col("lsh_bucket") === 3L)
      .collect().map(_.getLong(0)).toSeq
    assert(!single.contains(1L), "test setup: boundary neighbor must be missed")
    val multi = graft.operators.Ann.topKLshMultiProbe(corpus, "vec_id",
        "embedding", "lsh_bucket", planes, q, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(multi.head == 1L, s"multi-probe missed the boundary neighbor: $multi")
    assert(!multi.contains(3L), "two-flip bucket must stay unprobed")
  }

  test("residual IVF-PQ: residual round-trip, exact-cover rerank, in-cell determinism") {
    import spark.implicits._
    val dim = 8
    val rows = (0L until 60L).map(i =>
      (i, Seq.tabulate(dim)(j => (math.cos(i * 5 + j) + math.sin(j)).toFloat)))
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = graft.operators.Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
    val resid = graft.operators.Ann.withResiduals(
      graft.operators.Ann.withIvfAssignment(corpus, "embedding", cents),
      "embedding", "ivf_cell", cents)
    // residual + its cell centroid reconstructs the vector (float rounding only)
    resid.select("embedding", "ivf_cell", "residual").collect().foreach { r =>
      val x = r.getSeq[Float](0); val cell = r.getInt(1); val rv = r.getSeq[Float](2)
      x.indices.foreach { j =>
        assert(math.abs((rv(j) + cents(cell)(j)) - x(j)) < 1e-3f,
          s"residual reconstruction drifted at $j")
      }
    }
    val books = graft.operators.Ann.pqCodebooks(resid, "vec_id", "residual",
      m = 2, ksub = 4)
    val coded = graft.operators.Ann.withPqCodes(resid, "residual", books)
    val qv = rows(11)._2
    // with every cell probed and the rerank pool covering the whole corpus,
    // the result IS the exact top-k (the candidate-covering contract)
    val full = graft.operators.Ann.topKIvfResidualPq(coded, "vec_id",
        "embedding", "ivf_cell", "pq_code", cents, books, qv, k = 5,
        nProbe = 4, rerankFactor = 12)
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.operators.Ann.topK(corpus, "vec_id", "embedding", qv, 5)
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact, s"full-cover residual PQ != exact: $full vs $exact")
    // narrow probe returns k rows from the probed cells, deterministically
    val narrow = graft.operators.Ann.topKIvfResidualPq(coded, "vec_id",
      "embedding", "ivf_cell", "pq_code", cents, books, qv, k = 5, nProbe = 2)
    val n1 = narrow.collect().map(r => r.getLong(0)).toSeq
    val n2 = graft.operators.Ann.topKIvfResidualPq(coded.repartition(7),
      "vec_id", "embedding", "ivf_cell", "pq_code", cents, books, qv,
      k = 5, nProbe = 2).collect().map(r => r.getLong(0)).toSeq
    assert(n1 == n2, "residual PQ result depends on partitioning")
    assert(n1.size == 5)
  }

  test("residual coding has lower ADC distortion than raw-vector coding") {
    import spark.implicits._
    // clustered corpus: cells are far apart, members tight — the regime
    // IVF-PQ exists for; raw-vector codebooks must span the whole spread
    // while residual codebooks only cover the in-cell scatter
    val dim = 8
    val rnd = new scala.util.Random(7)
    val rows = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(dim)(j =>
        (10.0 * math.cos(c * 3 + j) + 0.3 * rnd.nextGaussian()).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = graft.operators.Ann.kmeansCentroids(corpus, "vec_id",
      "embedding", 4, iters = 3)
    val assigned = graft.operators.Ann.withIvfAssignment(corpus, "embedding", cents)
    val resid = graft.operators.Ann.withResiduals(assigned, "embedding",
      "ivf_cell", cents)
    def meanSqErr(df: org.apache.spark.sql.DataFrame, embCol: String,
                  books: Seq[Seq[Seq[Float]]]): Double = {
      val d = books.head.head.size
      val coded = graft.operators.Ann.withPqCodes(df, embCol, books)
      coded.select(org.apache.spark.sql.functions.col(embCol),
          org.apache.spark.sql.functions.col("pq_code")).collect().map { r =>
        val x = r.getSeq[Float](0); val code = r.getSeq[Int](1)
        x.indices.map { j =>
          val rec = books(j / d)(code(j / d))(j % d)
          val e = x(j).toDouble - rec; e * e
        }.sum
      }.sum / df.count()
    }
    val rawErr = meanSqErr(assigned, "embedding",
      graft.operators.Ann.pqCodebooks(assigned, "vec_id", "embedding",
        m = 2, ksub = 4, iters = 2))
    val resErr = meanSqErr(resid, "residual",
      graft.operators.Ann.pqCodebooks(resid, "vec_id", "residual",
        m = 2, ksub = 4, iters = 2))
    assert(resErr < rawErr,
      s"residual coding should beat raw coding here: $resErr vs $rawErr")
  }

  test("topKParents: parents dedup over the chunk pool, best chunk kept") {
    import spark.implicits._
    val dim = 4
    // parents 0..4, 3 chunks each; chunk vectors drift away from the query
    // with chunk index so each parent's FIRST chunk is its best
    val rows = for (p <- 0L until 5L; c <- 0 until 3) yield {
      val vec = Seq.tabulate(dim)(j =>
        (math.cos(p * 7 + j) + 0.1 * c * (j + 1)).toFloat)
      (p * 10 + c, p, vec)
    }
    val chunks = rows.toDF("chunk_id", "parent_id", "embedding")
    val qv = Seq.tabulate(dim)(j => math.cos(7 + j).toFloat) // near parent 1
    val out = graft.operators.Ann.topKParents(chunks, "chunk_id", "parent_id",
      "embedding", qv, k = 3, chunkPool = 15) // pool = all chunks
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // naive: per-parent best chunk by (score desc, chunk asc), top-3 parents
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < a.length) {
        val x = a(j).toDouble; val y = b(j).toDouble
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.groupBy(_._2).map { case (p, cs) =>
      val best = cs.map(c => (c._1, cos(c._3, qv)))
        .sortBy { case (id, s) => (-s, id) }.head
      (p, best._1, best._2)
    }.toSeq.sortBy { case (p, _, s) => (-s, p) }.take(3)
    assert(out == want, s"parent pooling drifted: $out vs $want")
    assert(out.head._1 == 1L) // the query targets parent 1
    // a parent appears at most once even though all its chunks are in pool
    assert(out.map(_._1).distinct.size == out.size)
  }

  test("topKParents: chunkPool smaller than a parent's chunk count still dedups") {
    import spark.implicits._
    // one dominant parent whose chunks fill the pool: output must be ONE row
    val rows = (0 until 6).map(c => (c.toLong, 0L, Seq(1.0f, 0.5f * c))) ++
      Seq((100L, 1L, Seq(-1.0f, 0.0f)))
    val chunks = rows.toDF("chunk_id", "parent_id", "embedding")
    val out = graft.operators.Ann.topKParents(chunks, "chunk_id", "parent_id",
      "embedding", Seq(1.0f, 0.0f), k = 5, chunkPool = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L)) // pool holds only parent-0 chunks -> one parent
  }

  // ---- MIPS: the inner-product metric and its cosine reduction

  test("topKMips equals driver-side dot-product sort.take, bit-exact") {
    val q = Seq.tabulate(12)(i => (i - 6) / 7f)
    val got = Ann.topKMips(corpus, "id", "emb", q, 9)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val all = corpus.collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0
        v.indices.foreach(i => d += v(i).toDouble * q(i).toDouble)
        (r.getLong(0), d)
      }
      .sortBy(x => (-x._2, x._1)).take(9)
    assert(got.toSeq == all.toSeq)
  }

  test("MIPS != cosine: a long vector outranks a better-aligned short one") {
    // v1 is perfectly aligned but short; v2 misaligned but long — MIPS
    // must prefer v2, cosine must prefer v1 (the metrics genuinely differ
    // on this corpus, so the next test's reduction is non-vacuous)
    val df = Seq((1L, Seq(0.1f, 0f)), (2L, Seq(5f, 3f)))
      .toDF("id", "emb")
    val q = Seq(1f, 0f)
    assert(Ann.topKMips(df, "id", "emb", q, 1).collect().head.getLong(0) == 2L)
    assert(Ann.topK(df, "id", "emb", q, 1).collect().head.getLong(0) == 1L)
  }

  test("MIPS augmentation: cosine order over augmented space == dot order; norms equalized") {
    val rnd = new scala.util.Random(5)
    // varied norms on purpose — scale rows so MIPS and cosine disagree
    val df = Seq.tabulate(80)(i =>
        (i.toLong, Array.fill(6)((rnd.nextFloat() * 2 - 1) * (1 + i % 7))))
      .toDF("id", "emb")
    val aug = Ann.withMipsAugmentation(df, "emb").localCheckpoint(true)
    // all augmented norms equal (to float precision): max/min ratio ~ 1
    val norms = aug.select(
        graft.functions.VectorFunctions.l2Norm(col("mips_aug")).as("n"))
      .agg(max("n"), min("n")).head()
    assert(norms.getDouble(0) / norms.getDouble(1) < 1.0001,
      s"augmented norms should equalize, got ${norms}")
    for (qi <- 1 to 5) {
      val q = Seq.fill(6)(rnd.nextFloat() * 2 - 1)
      val wantIds = Ann.topKMips(df, "id", "emb", q, 10)
        .select("id").collect().map(_.getLong(0)).toSeq
      val gotIds = Ann.topK(aug, "id", "mips_aug", Ann.mipsQuery(q), 10)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(gotIds == wantIds, s"query $qi: augmented-cosine order diverged")
    }
  }

  test("MIPS augmentation rides the IVF index: full probe == exact MIPS order") {
    val rnd = new scala.util.Random(9)
    val df = Seq.tabulate(120)(i =>
        (i.toLong, Array.fill(6)((rnd.nextFloat() * 2 - 1) * (1 + i % 5))))
      .toDF("id", "emb")
    val aug = Ann.withMipsAugmentation(df, "emb").localCheckpoint(true)
    val cents = Ann.sampleCentroids(aug, "id", "mips_aug", 4)
    val assigned = Ann.withIvfAssignment(aug, "mips_aug", cents)
    val q = Seq.fill(6)(rnd.nextFloat() * 2 - 1)
    val want = Ann.topKMips(df, "id", "emb", q, 8)
      .select("id").collect().map(_.getLong(0)).toSeq
    val got = Ann.topKIvf(assigned, "id", "mips_aug", "ivf_cell", cents,
        Ann.mipsQuery(q), k = 8, nProbe = 4)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == want, "full-probe IVF over augmented vectors must equal exact MIPS order")
  }

  test("withSignProjection: coordinates ≡ driver index-order fold, partition-stable") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(50)(i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
    val signs = Ann.signMatrix(12, 4, seed = 5)
    def driverProj(v: Seq[Float]): Seq[Float] = signs.map { s =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * s(i).toDouble; i += 1 }
      acc.toFloat
    }
    for (parts <- Seq(1, 5)) {
      val got = Ann.withSignProjection(
        rows.toDF("id", "emb").repartition(parts), "emb", signs, "proj")
        .select("id", "proj").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
      rows.foreach { case (id, v) => assert(got(id) == driverProj(v.toSeq), s"id=$id") }
    }
    assert(Ann.signMatrix(12, 4, seed = 5) == signs, "matrix is seed-deterministic")
    assert(signs.flatten.forall(v => v == 1f || v == -1f))
  }

  test("sign projection preserves neighborhoods on clustered data (pool recall)") {
    val rnd = new scala.util.Random(17)
    val centers = Seq.fill(5)(Array.fill(32)(rnd.nextFloat() * 2 - 1))
    val rows = Seq.tabulate(200) { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    }
    val df = rows.toDF("id", "emb")
    val q = rows(40)._2.toSeq // a member of cluster 0
    val exactTop = Ann.topK(df.where($"id" =!= 40L), "id", "emb", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val signs = Ann.signMatrix(32, 8, seed = 3)
    val proj = Ann.withSignProjection(df, "emb", signs, "proj")
    val qp = proj.where($"id" === 40L).select("proj").head.getSeq[Float](0).toSeq
    val pool = Ann.topK(proj.where($"id" =!= 40L), "id", "proj", qp, 30)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = exactTop.intersect(pool).size.toDouble / exactTop.size
    assert(recall >= 0.8, s"projected pool recall $recall — JL quality collapsed")
  }

  test("hardNegatives: top different-label rows, anchor excluded, ≡ driver ranking") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.tabulate(120)(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1), i % 3))
    val df = rows.toDF("id", "emb", "label")
    val anchors = Seq(5, 40).map { i =>
      val r = rows(i); (r._1, r._2.toSeq, r._3)
    }
    val got = Ann.hardNegatives(df, "id", "emb", "label", anchors, nNeg = 7)
      .select("qid", "rank", "id", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    anchors.foreach { case (qid, qv, ql) =>
      val want = rows.filter(_._3 != ql)
        .map(r => (r._1, Ann.cosine(r._2.toSeq, qv)))
        .sortBy(x => (-x._2, x._1)).take(7)
      val g = got(qid).sortBy(_._2)
      assert(g.map(x => (x._3, x._4)).toSeq == want, s"anchor $qid")
      assert(g.forall(_._3 != qid), "anchor never mines itself")
      assert(g.map(_._2).toSeq == (1 to 7), "ranks are 1..nNeg")
      val labels = rows.map(r => r._1 -> r._3).toMap
      assert(g.forall(x => labels(x._3) != ql), "no same-label negative")
    }
  }
}
