package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

import graft.functions.TextNorm
import graft.operators.{FeatureScale, Percentiles, Winsorize}

/** Text canonicalization (NFC expression + composite normalizer),
  * per-group winsorization, and robust per-dimension feature scaling.
  */
class NormScaleSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- TextNorm

  test("nfcNormalize: decomposed accents compose; composed text unchanged") {
    // "é" as e + COMBINING ACUTE (U+0301) vs precomposed U+00E9
    val decomposed = "cafe\u0301" // e + combining acute (NFD)
    val composed = "caf\u00e9"
    val out = Seq(decomposed, composed, "plain ascii")
      .toDF("s").select(TextNorm.nfcNormalize($"s").as("n"))
      .as[String].collect()
    assert(out(0) == composed, "NFD input must compose to NFC")
    assert(out(1) == composed)
    assert(out(2) == "plain ascii")
  }

  test("nfcNormalize: null passes through; non-string input rejected") {
    val n = Seq(Option.empty[String]).toDF("s")
      .select(TextNorm.nfcNormalize($"s")).collect()
    assert(n.head.isNullAt(0))
    intercept[Exception] {
      Seq(1).toDF("s").select(TextNorm.nfcNormalize($"s")).collect()
    }
  }

  test("normalized: casefold, punctuation strip, whitespace collapse, trim") {
    val out = Seq(
      "  Hello,   WORLD!! ",
      "tabs\tand\nnewlines",
      "keep 123 digits",
      "CAF\u00c9 du Monde" // uppercase precomposed E-acute
    ).toDF("s").select(TextNorm.normalized($"s").as("n")).as[String].collect()
    assert(out(0) == "hello world")
    assert(out(1) == "tabs and newlines")
    assert(out(2) == "keep 123 digits")
    assert(out(3) == "caf\u00e9 du monde")
  }

  test("normalized: identical fingerprints for accent-decomposed copies") {
    val df = Seq("re\u0301sume\u0301 text", "r\u00e9sum\u00e9 text").toDF("s")
    val fps = df.select(md5(TextNorm.normalized($"s"))).as[String].collect()
    assert(fps(0) == fps(1),
      "NFD and NFC copies of the same text must dedup together")
  }

  // ------------------------------------------------------------ Winsorize

  private lazy val tele = Seq(
    (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
    (5L, "a", 5.0), (6L, "a", 6.0), (7L, "a", 7.0), (8L, "a", 8.0),
    (9L, "a", 9.0), (10L, "a", 1000.0),
    (11L, "b", 5.0), (12L, "b", 5.0)
  ).toDF("id", "g", "v")

  test("clipped: extremes land on the band edge, interior values untouched") {
    val out = Winsorize.clipped(tele, "g", "v", 0.10, 0.90)
      .select("id", "v_clipped").as[(Long, Double)].collect().toMap
    // group a: p10/p90 of 1..9,1000 (interpolated) = 1.9 / 107.2...
    assert(out(1L) > 1.0 && out(1L) < 2.0, "low tail clips up to p10")
    assert(out(10L) < 1000.0, "high tail clips down to p90")
    assert(out(5L) == 5.0, "interior untouched")
    assert(out(11L) == 5.0, "constant group maps to itself")
  }

  test("clipped: null values dropped; pLo >= pHi rejected") {
    val withNull = tele.union(
      Seq((99L, "a")).toDF("id", "g").withColumn("v", lit(null).cast("double"))
        .select("id", "g", "v"))
    assert(!Winsorize.clipped(withNull, "g", "v").select("id")
      .as[Long].collect().contains(99L))
    intercept[IllegalArgumentException] {
      Winsorize.clipped(tele, "g", "v", 0.9, 0.1)
    }
  }

  test("clipped plan: broadcast join back, no sort-merge") {
    val plan = Winsorize.clipped(tele, "g", "v").queryExecution.sparkPlan
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size == 1)
  }

  // ---------------------------------------------------------- FeatureScale

  // dim 0 spread {0,1,2,3,4}, dim 1 constant — the IQR=0 degenerate path
  private lazy val vecs = Seq(
    (1L, Seq(0.0f, 7.0f)), (2L, Seq(1.0f, 7.0f)), (3L, Seq(2.0f, 7.0f)),
    (4L, Seq(3.0f, 7.0f)), (5L, Seq(4.0f, 7.0f))
  ).toDF("vec_id", "embedding")

  test("robustScaleLong: known medians/IQR; zero-IQR dim centers without NaN") {
    val out = FeatureScale.robustScaleLong(vecs, "vec_id", "embedding")
      .as[(Long, Int, Double)].collect()
      .map { case (id, d, z) => (id, d) -> z }.toMap
    // dim 0: median 2, IQR = p75-p25 = 3-1 = 2 → z of v=4 is 1.0
    assert(out((5L, 0)) == 1.0)
    assert(out((3L, 0)) == 0.0)
    assert(out((1L, 0)) == -1.0)
    // dim 1: constant → median 7, IQR 0 → divide by 1 → all zeros, no NaN
    (1L to 5L).foreach(id => assert(out((id, 1)) == 0.0))
  }

  test("robustScaleLong: null embeddings dropped; sketch mode ≡ exact here") {
    val withNull = vecs.union(
      Seq(Tuple1(99L)).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
    val out = FeatureScale.robustScaleLong(withNull, "vec_id", "embedding")
    assert(!out.select("vec_id").as[Long].collect().contains(99L))
    val exact = FeatureScale.robustScaleLong(vecs, "vec_id", "embedding")
      .as[(Long, Int, Double)].collect().toSet
    val sketch = FeatureScale.robustScaleLong(vecs, "vec_id", "embedding",
        Percentiles.Mode.Sketch(1000000))
      .as[(Long, Int, Double)].collect().toSet
    // 5 values per dim, odd, middle-tied quartile neighbors → the GK order
    // statistic equals the interpolated quartiles exactly on this fixture
    assert(exact == sketch)
  }

  test("robustScaleLong plan: stats broadcast back, exploded stream unshuffled by the join") {
    val plan = FeatureScale.robustScaleLong(vecs, "vec_id", "embedding")
      .queryExecution.sparkPlan
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size == 1)
  }
}
