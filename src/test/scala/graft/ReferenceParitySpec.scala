package graft

import org.apache.spark.sql.functions._

import graft.api.{IndexBuilder, SemanticSearch}
import graft.embed.HashingTfEmbedder
import graft.ingest.WorkoutCorpus

/** Ports the reference's own inline verification queries (SURVEY §5.1) as
  * asserted goldens, running our ingest + search over the reference's sample
  * corpus (`/root/reference/00_sample_workout_data.csv`, read in place; the
  * suite self-cancels if the corpus is not present).
  *
  * Profiled invariants pinned here come from SURVEY §1.2: 2,000 records,
  * sport/difficulty distributions, 127 null DISTANCE_METERS, `very hard`
  * (space) spelling with zero `very_hard` rows.
  */
class ReferenceParitySpec extends SparkSpec {

  private val csv = "/root/reference/00_sample_workout_data.csv"
  private def corpusAvailable = new java.io.File(csv).isFile

  private lazy val df = WorkoutCorpus.readCsv(spark, csv).cache()

  test("corpus loads 2,000 records through multiline-quoted CSV ingest") {
    assume(corpusAvailable)
    assert(df.count() == 2000)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 0)
  }

  test("post-load distribution matches the reference's verification query (01:144-153)") {
    assume(corpusAvailable)
    val bySport = df.groupBy("SPORT_TYPE").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySport == Map("run" -> 1001L, "ride" -> 489L, "swim" -> 227L,
      "alpineski" -> 84L, "hike" -> 72L, "workout" -> 65L, "yoga" -> 62L))
    val byDiff = df.groupBy("DIFFICULTY").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDiff("easy") == 558L && byDiff("moderate") == 566L
      && byDiff("hard") == 611L && byDiff("very hard") == 265L)
    assert(!byDiff.contains("very_hard")) // notebook Q3's zero-match filter
  }

  test("NULLIF load semantics: 127 rows with empty DISTANCE_METERS -> null") {
    assume(corpusAvailable)
    assert(df.where(col("DISTANCE_METERS").isNull).count() == 127)
  }

  test("embedding coverage is 100% of non-null EMBED_STR (02:353-359)") {
    assume(corpusAvailable)
    val idx = IndexBuilder.withEmbeddings(df, HashingTfEmbedder(256))
    val r = idx.agg(
      count(lit(1)).as("total"),
      count(col("EMBEDDING")).as("embedded"),
      sum(when(col("EMBED_STR").isNotNull, 1).otherwise(0)).as("with_text")).head()
    assert(r.getLong(1) == r.getLong(2), "every non-null text must embed")
  }

  test("Example Query 1 (02:204-227): run 4.5-6km, k=5, scores descending, filters hold") {
    assume(corpusAvailable)
    val embedder = HashingTfEmbedder(256)
    val index = IndexBuilder.withEmbeddings(df, embedder)
    val search = new SemanticSearch(index, embedder)
    val hits = search.topK("5k interval run workout with speed training", 5,
      filter = col("SPORT_TYPE") === "run"
        && col("DISTANCE_METERS") >= 4500 && col("DISTANCE_METERS") <= 6000)
      .select(col("ID"), col("SIMILARITY_SCORE"), col("SPORT_TYPE"),
        round(col("DISTANCE_METERS") / 1000.0, 1).as("DISTANCE_KM"),
        round(col("MOVING_TIME_SECONDS") / 60.0, 1).as("DURATION_MIN"))
      .collect()
    assert(hits.length == 5)
    val scores = hits.map(_.getAs[Double]("SIMILARITY_SCORE"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(hits.forall(_.getAs[String]("SPORT_TYPE") == "run"))
    assert(hits.forall { h =>
      val km = h.getAs[Double]("DISTANCE_KM"); km >= 4.5 && km <= 6.0
    })
  }

  test("similarity histogram buckets partition the corpus (02:372-389)") {
    assume(corpusAvailable)
    val embedder = HashingTfEmbedder(256)
    val index = IndexBuilder.withEmbeddings(df, embedder)
    val search = new SemanticSearch(index, embedder)
    val scored = search.topK("morning yoga flexibility session", 2000)
    val buckets = scored.withColumn("bucket",
        when(col("SIMILARITY_SCORE") >= 0.9, "0.90-1.00")
          .when(col("SIMILARITY_SCORE") >= 0.8, "0.80-0.89")
          .when(col("SIMILARITY_SCORE") >= 0.7, "0.70-0.79")
          .otherwise("below"))
      .groupBy("bucket").count().collect().map(_.getLong(1)).sum
    assert(buckets == 2000L, "histogram buckets must partition the corpus")
  }
}
