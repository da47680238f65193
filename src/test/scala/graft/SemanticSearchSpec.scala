package graft

import org.apache.spark.sql.functions._

import graft.api.{CacheDecision, IndexBuilder, SemanticSearch}
import graft.embed.HashingTfEmbedder

class SemanticSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embedder = HashingTfEmbedder(128)

  private lazy val corpus = Seq(
    ("W1", "5k interval run workout with speed training", "run", "easy", 5000),
    ("W2", "easy recovery jog around the park", "run", "easy", 4000),
    ("W3", "long endurance ride with hill climbs", "ride", "hard", 40000),
    ("W4", "open water swim technique session", "swim", "moderate", 1500),
    ("W5", "interval run with sprints and speed work", "run", "hard", 6000)
  ).toDF("ID", "EMBED_STR", "SPORT_TYPE", "DIFFICULTY", "DISTANCE_METERS")

  private lazy val index = IndexBuilder.withEmbeddings(corpus, embedder)
  private lazy val search = new SemanticSearch(index, embedder)

  test("embedCol equals driver-side embed pointwise") {
    val rows = index.select("EMBED_STR", "EMBEDDING").collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](1) == embedder.embed(r.getString(0)).toSeq,
        s"column/driver embedding mismatch for: ${r.getString(0)}")
    }
  }

  test("topK: k rows, descending scores, semantically sensible top hit") {
    val hits = search.topK("interval speed run", 3).collect()
    assert(hits.length == 3)
    val scores = hits.map(_.getAs[Double]("SIMILARITY_SCORE"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(Set("W1", "W5").contains(hits.head.getAs[String]("ID")))
  }

  test("topK honors filters before ranking") {
    val hits = search.topK("interval speed run", 5,
      filter = col("SPORT_TYPE") === "run" && col("DISTANCE_METERS") >= 4500).collect()
    assert(hits.map(_.getAs[String]("ID")).toSet.subsetOf(Set("W1", "W5")))
  }

  test("search(): Method-1 contract — requested columns only, all strings") {
    val out = search.search(
      """{"query":"interval run","columns":["ID","SPORT_TYPE","DISTANCE_METERS"],
        |"filter":{"@eq":{"SPORT_TYPE":"run"}},"limit":2}""".stripMargin)
    assert(out.columns.toSeq == Seq("ID", "SPORT_TYPE", "DISTANCE_METERS"))
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(1) == "run"))
  }

  test("search(): query_vector request bypasses the embedder (stored-vector path)") {
    val vec = embedder.embed("interval run with sprints and speed work")
    val out = search.search(
      s"""{"query_vector":[${vec.mkString(",")}],
         |"columns":["ID","SPORT_TYPE"],"limit":1}""".stripMargin).collect()
    // exact self-match: W5's own embedding must rank itself first
    assert(out.head.getString(0) == "W5")
    // and it must agree with the equivalent text request (same embedder)
    val viaText = search.search(
      """{"query":"interval run with sprints and speed work",
        |"columns":["ID","SPORT_TYPE"],"limit":1}""".stripMargin).collect()
    assert(viaText.head.getString(0) == out.head.getString(0))
  }

  test("searchResponseJson is a {results:[...]} envelope") {
    val json = search.searchResponseJson(
      """{"query":"swim","columns":["ID"],"limit":1}""")
    assert(json.startsWith("""{"results":["""))
    assert(json.contains(""""ID""""))
  }

  test("determinism: same query twice gives identical results") {
    val a = search.topK("hill ride", 5).collect().map(_.toString).toSeq
    val b = search.topK("hill ride", 5).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("cache decision thresholds (02:309-315 semantics)") {
    val df = Seq(0.95, 0.85, 0.75, 0.65).toDF("score")
      .select(col("score"), CacheDecision.decision(col("score")).as("d"),
        CacheDecision.rubricTier(col("score")).as("t"))
    val rows = df.collect()
      .map(r => r.getDouble(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(0.95)._1.startsWith("CACHE HIT - Excellent"))
    assert(rows(0.85)._1.startsWith("CACHE HIT - Excellent")) // script: > 0.80
    assert(rows(0.75)._1.startsWith("CACHE HIT - Good"))
    assert(rows(0.65)._1.startsWith("CACHE MISS"))
    assert(rows(0.95)._2 == "excellent" && rows(0.85)._2 == "very good"
      && rows(0.75)._2 == "good" && rows(0.65)._2 == "miss")
  }

  test("query embedding is folded as a literal — no join in the plan") {
    val plan = search.topK("interval run", 3).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join:\n$plan")
  }
}
