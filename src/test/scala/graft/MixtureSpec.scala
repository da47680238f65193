package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Mixture resampling: integer quotas, allowlist semantics, short-source
  * honesty, deterministic growth-stable membership.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // a: 10 rows, b: 4 rows, c: 6 rows (unlisted), plus nulls
  private lazy val rows = (
    (1L to 10L).map(i => (i, "a")) ++
      (21L to 24L).map(i => (i, "b")) ++
      (31L to 36L).map(i => (i, "c")) :+ (99L, null.asInstanceOf[String])
  ).toDF("id", "src")

  private val targets = Seq("a" -> 1L, "b" -> 3L, "x" -> 4L) // sumW = 8

  test("quotas: floor-division shares, allowlist zeros, coverage gaps, short flag") {
    val got = Mixture.quotas(rows, "src", targets, budget = 8L)
      .select("src", "n_in", "weight", "quota", "n_keep", "under_quota")
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 10L, 1L, 1L, 1L, false)), "8*1 div 8 = 1")
    assert(got("b") === (("b", 4L, 3L, 3L, 3L, false)))
    assert(got("c") === (("c", 6L, 0L, 0L, 0L, false)),
      "unlisted source: weight 0, keeps nothing")
    assert(got("x") === (("x", 0L, 4L, 4L, 0L, true)),
      "listed-but-absent source surfaces as an under-quota coverage gap")
    assert(got.size === 4)
  }

  test("short source keeps everything it has and flags under_quota") {
    val got = Mixture.quotas(rows, "src", Seq("b" -> 1L), budget = 100L)
      .where(col("src") === "b")
      .select("quota", "n_keep", "under_quota")
      .as[(Long, Long, Boolean)].head()
    assert(got === ((100L, 4L, true)))
  }

  test("sample: per-source kept counts == plan; membership deterministic and growth-stable") {
    val kept = Mixture.sampleToMixture(rows, "id", "src", targets, 8L)
      .select("id", "src").as[(Long, String)].collect().toSet
    assert(kept.count(_._2 == "a") == 1 && kept.count(_._2 == "b") == 3)
    assert(!kept.exists(_._2 == "c") && !kept.exists(_._2 == null))
    // determinism under partitioning
    val again = Mixture.sampleToMixture(rows.repartition(7), "id", "src",
      targets, 8L).select("id", "src").as[(Long, String)].collect().toSet
    assert(again === kept)
    // growth stability: new rows in c (weight 0) and b's quota already
    // met by... b grows but its kept set may change — the guarantee is
    // PER-SOURCE isolation: a's kept row is untouched by b/c growth
    val grown = rows.union(Seq((25L, "b"), (37L, "c")).toDF("id", "src"))
    val keptA = Mixture.sampleToMixture(grown, "id", "src", targets, 8L)
      .where(col("src") === "a").select("id").as[Long].collect().toSet
    assert(keptA === kept.filter(_._2 == "a").map(_._1),
      "another source's growth must not move this source's membership")
  }

  test("upsampleToQuota: every listed source lands on exactly its quota") {
    // sumW=8, budget=16: a quota=2 (10 rows -> downsample), b quota=6
    // (4 rows -> 1 full epoch + 2 remainder copies)
    val got = Mixture.upsampleToQuota(rows, "id", "src", targets, budget = 16L)
      .select("id", "src", "epoch").as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2)
    assert(bySrc("a").length === 2 && bySrc("a").forall(_._3 == 1L))
    assert(bySrc("b").length === 6, "4 rows + 2 remainder copies = quota 6")
    val bCopies = bySrc("b").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(bCopies.values.count(_ == Seq(1L, 2L)) === 2,
      "exactly the 2 first-ranked rows carry the extra epoch")
    assert(bCopies.values.count(_ == Seq(1L)) === 2)
    assert(!bySrc.contains("c") && !bySrc.contains("x"),
      "unlisted keeps nothing; absent sources cannot be upsampled")
    // downsampled source picks the same members sampleToMixture picks
    val mix = Mixture.sampleToMixture(rows, "id", "src", targets, 16L)
      .where(col("src") === "a").select("id").as[Long].collect().toSet
    assert(bySrc("a").map(_._1).toSet === mix)
  }

  test("sampleToTokenBudget: greedy ranked prefix within per-source token quota") {
    val toks = Seq(
      (1L, "a", 50L), (2L, "a", 50L), (3L, "a", 50L), // uniform order decides
      (21L, "b", 10L), (22L, "b", 10L)
    ).toDF("id", "src", "tok")
    // sumW=3: a quota = 120*2/3 = 80 -> first ranked row (50) fits, second
    // would cross (100 > 80): prefix of 1; b quota = 40 -> both fit (20)
    val got = Mixture.sampleToTokenBudget(toks, "id", "src", "tok",
        Seq("a" -> 2L, "b" -> 1L), tokenBudget = 120L)
      .select("id", "src").as[(Long, String)].collect()
    assert(got.count(_._2 == "a") === 1)
    assert(got.count(_._2 == "b") === 2)
    // a row bigger than the whole quota blocks its source entirely
    val fat = Seq((1L, "a", 999L), (2L, "a", 1L)).toDF("id", "src", "tok")
    val none = Mixture.sampleToTokenBudget(fat, "id", "src", "tok",
      Seq("a" -> 1L), tokenBudget = 100L)
    // greedy prefix: if the FIRST-ranked row overflows, nothing survives;
    // if the 1-token row ranks first it survives alone
    val ids = none.select("id").as[Long].collect().toSet
    assert(ids === Set.empty[Long] || ids === Set(2L))
    assert(!ids.contains(1L))
  }

  test("temperature mixing: isqrt weights, flattening vs proportional, == explicit-target path") {
    // head 100 rows / mid 25 / tail 4 → weights ⌊√n⌋ = 10 / 5 / 2
    val skewed = ((1L to 100L).map(i => (i, "head")) ++
      (201L to 225L).map(i => (i, "mid")) ++
      (301L to 304L).map(i => (i, "tail"))).toDF("id", "src")
    val w = Mixture.temperatureTargets(skewed, "src")
    assert(w === Seq("head" -> 10L, "mid" -> 5L, "tail" -> 2L))
    // the convenience entry IS sampleToMixture under those weights
    val viaTemp = Mixture.sampleToTemperature(skewed, "id", "src", budget = 34L)
      .select("id").as[Long].collect().sorted.toSeq
    val viaExplicit = Mixture.sampleToMixture(skewed, "id", "src", w,
        budget = 34L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaTemp === viaExplicit)
    // flattening: proportional mixing gives head 100/129 ≈ 78% of the
    // budget; temperature gives it 10/17 ≈ 59% — the tail's share rises
    val bySrc = Mixture.sampleToTemperature(skewed, "id", "src", budget = 34L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("head") === 20L, "34*10 div 17") // vs 26 proportional
    assert(bySrc("mid") === 10L, "34*5 div 17")
    assert(bySrc("tail") === 4L, "34*2 div 17 = 4, capped by n_in=4")
    // every present source is listed — no allowlist hole in this mode
    assert(bySrc.keySet === Set("head", "mid", "tail"))
  }

  test("contract checks: empty/duplicate/negative targets, bad budget") {
    intercept[IllegalArgumentException] {
      Mixture.quotas(rows, "src", Seq.empty, 10L)
    }
    intercept[IllegalArgumentException] {
      Mixture.quotas(rows, "src", Seq("a" -> 1L, "a" -> 2L), 10L)
    }
    intercept[IllegalArgumentException] {
      Mixture.quotas(rows, "src", Seq("a" -> -1L), 10L)
    }
    intercept[IllegalArgumentException] {
      Mixture.quotas(rows, "src", Seq("a" -> 0L), 10L)
    }
    intercept[IllegalArgumentException] {
      Mixture.quotas(rows, "src", Seq("a" -> 1L), 0L)
    }
  }
}
