package graft

import org.apache.spark.sql.functions._

import graft.functions.DetMath
import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark fast join fast fast"),
    (2L, "spark slow scan"),
    (3L, "join join join table table"),
    (4L, "vector search vector index"),
    (5L, "spark join fast")
  ).toDF("id", "text")

  test("lnDet tracks Math.log to float tolerance over the idf domain") {
    val xs = Seq(1.0000001, 1.5, 2.0, 3.7, 10.0, 123.456, 1e3, 1e6, 2.5e14)
    val got = DetMath.withLnDet(xs.toDF("x"), "x", "l")
      .orderBy("x").collect().map(_.getDouble(1))
    xs.sorted.zip(got).foreach { case (x, l) =>
      assert(math.abs(l - math.log(x)) <= 4 * math.ulp(math.log(x).max(1.0)),
        s"lnDet($x)=$l vs ${math.log(x)}")
    }
  }

  test("lnDet is exact at powers of two times the series' own ln2") {
    // x = 2^k reduces to m=1, t=0 -> result is exactly k*Ln2
    val got = DetMath.withLnDet(Seq(1.0, 2.0, 4.0, 1024.0).toDF("x"), "x", "l")
      .orderBy("x").collect().map(_.getDouble(1))
    assert(got(0) == 0.0)
    assert(got(1) == DetMath.Ln2)
    assert(got(2) == 2.0 * DetMath.Ln2)
    assert(got(3) == 10.0 * DetMath.Ln2)
  }

  test("pow2Decay tracks math.pow, is exact at whole half-lives, underflows at 64") {
    val xs = Seq(0.0, 0.3, 1.0, 1.5, 3.0, 6.99, 10.0, 40.5, 63.9, 64.0, 200.0)
    val got = DetMath.withPow2Decay(xs.toDF("f"), "f", "d")
      .orderBy("f").collect().map(_.getDouble(1))
    xs.sorted.zip(got).foreach { case (f, d) =>
      val ref = if (f >= 64.0) 0.0 else math.pow(2.0, -f)
      assert(math.abs(d - ref) <= 4 * math.ulp(ref.max(Double.MinPositiveValue)),
        s"decay($f)=$d vs $ref")
    }
    // whole half-lives hit the exact ladder constant (Taylor(0) folds to 1)
    assert(got(xs.sorted.indexOf(1.0)) == 0.5)
    assert(got(xs.sorted.indexOf(3.0)) == 0.125)
    assert(got(xs.sorted.indexOf(64.0)) == 0.0)
  }

  test("BM25 matches a brute-force reference on scores and ranking") {
    val terms = Seq("spark", "join", "fast")
    val k1 = 1.2; val b = 0.75
    // brute force in plain Scala, same ln via a local copy of the math
    val corpus = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = corpus.length
    val avgdl = corpus.map(_._2.length).sum.toDouble / n
    val dfm = terms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    def idf(df: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val expect = corpus.map { case (id, toks) =>
      val dl = toks.length
      val score = terms.sorted.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0
        else idf(dfm(t)) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
      }.sum
      id -> score
    }.filter(_._2 > 0).toMap

    val got = Bm25.scoreAll(docs, "id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"doc $id: $s vs ${expect(id)}")
    }
    // rare-term weighting: doc 4 is the only 'vector' doc and must win that query
    val top = Bm25.search(docs, "id", "text", Seq("vector"), k = 1).collect()
    assert(top.head.getLong(0) == 4L)
  }

  test("the idf join broadcasts and the pipeline has no cartesian product") {
    val plan = Bm25.search(docs, "id", "text", Seq("spark"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("postings serving path: bit-identical scores to the batch path; one file per term") {
    val terms = Seq("spark", "join")
    val batch = Bm25.scoreAll(docs, "id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val dir = java.nio.file.Files.createTempDirectory("bm25post").toString
    Bm25.buildPostings(docs, "id", "text")
      .write.mode("overwrite").partitionBy("term").parquet(dir)
    val postings = spark.read.parquet(dir)
    // index metadata, computed once at build time
    val dfMap = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
    val idfMap = Bm25.idfByTerm(dfMap, stats.getLong(1), spark)
    val served = Bm25.searchPostings(postings, "id", terms, idfMap, avgdl, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served.keySet == batch.keySet)
    served.foreach { case (id, s) =>
      assert(s == batch(id), s"doc $id: served $s != batch ${batch(id)}")
    }
    // layout contract: the repartition(term) write leaves ONE data file per
    // term directory (file count, not bytes, dominated read latency)
    val termDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("term="))
    assert(termDirs.nonEmpty)
    termDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("RRF fuses full-outer: both-leg docs outrank single-leg docs at equal rank") {
    val legA = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val legB = Seq((10L, 2), (13L, 1)).toDF("id", "rank")
    val fused = Bm25.rrfFuse(Seq(legA, legB), "id", "rank", c = 60, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val m = fused.toMap
    // doc 10 in both legs: 1/61 + 1/62
    assert(m(10L) == 1.0 / 61.0 + 1.0 / 62.0)
    // single-leg docs present with their one reciprocal
    assert(m(13L) == 1.0 / 61.0 && m(11L) == 1.0 / 62.0 && m(12L) == 1.0 / 63.0)
    assert(fused.head._1 == 10L) // both-legs doc wins
  }
}
