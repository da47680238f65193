package graft

import org.apache.spark.sql.functions._

import graft.api.{CachedSearch, IndexBuilder, ResultCache, SemanticSearch}
import graft.embed.HashingTfEmbedder
import graft.operators.Skew

class SkewAndCacheSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals unsalted join exactly, spread over salt reducers") {
    val facts = Seq.tabulate(500)(i =>
      (if (i % 5 == 0) 1L else i.toLong % 50, s"v$i")).toDF("k", "payload")
    val dims = Seq.tabulate(50)(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val expected = facts.join(dims, Seq("k"), "inner")
      .select("k", "payload", "name").collect().map(_.toString).sorted.toSeq
    val got = Skew.saltedJoin(facts, dims, "k", salt = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted.toSeq
    assert(got == expected)
  }

  /** The other half of the skew story: salting handles KNOWN hot keys
    * structurally; AQE's skew join handles the ones discovered at runtime.
    * Thresholds default to cluster scale, so the test lowers them until a
    * deliberately skewed shuffle join is split — the executed SMJ must be
    * marked as skew-handled. This pins the conf the engine relies on, not
    * just the claim in SCALE.md.
    */
  test("AQE splits a runtime-skewed sort-merge join (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one giant key (80% of rows) against a uniform dim side
      val facts = Seq.tabulate(20000)(i =>
        (if (i % 5 != 0) 7L else i.toLong % 40, s"payload-$i-${"x" * 32}"))
        .toDF("k", "payload")
      val dims = Seq.tabulate(40)(i => (i.toLong, s"dim$i")).toDF("k", "name")
      val joined = facts.join(dims, Seq("k"), "inner")
      // collect() executes THIS queryExecution so the AdaptiveSparkPlan
      // mutates to its final form (a write would clone the plan)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("result cache: TTL-bounded LRU with injectable clock") {
    var now = 0L
    val cache = new ResultCache[String](maxEntries = 2, ttlMillis = 1000L,
      clock = () => now)
    var computes = 0
    def get(k: String) = cache.getOrCompute(k) { computes += 1; s"r-$k" }

    assert(get("a") == "r-a" && computes == 1)
    assert(get("a") == "r-a" && computes == 1) // hit
    now = 500
    assert(get("a") == "r-a" && computes == 1) // still fresh
    now = 1600
    assert(get("a") == "r-a" && computes == 2) // expired -> recompute
    get("b"); get("c")                          // evicts LRU beyond 2 entries
    assert(cache.size <= 2)
    assert(cache.hits == 2 && cache.misses == 4)
  }

  test("cached search: identical request JSON short-circuits the second job") {
    val corpus = Seq(("D1", "alpha beta gamma"), ("D2", "delta epsilon"))
      .toDF("ID", "EMBED_STR")
    val embedder = HashingTfEmbedder(64)
    val search = new SemanticSearch(
      IndexBuilder.withEmbeddings(corpus, embedder), embedder)
    val cache = new ResultCache[String]()
    val cached = new CachedSearch(search, cache)
    val req = """{"query":"alpha","columns":["ID"],"limit":1}"""
    val r1 = cached.searchResponseJson(req)
    val r2 = cached.searchResponseJson(req)
    assert(r1 == r2 && r1.contains("D1"))
    assert(cache.hits == 1 && cache.misses == 1)
  }

  test("GraftSession registers SQL functions on an attached session") {
    val s2 = graft.api.GraftSession.getOrCreate()
    assert(s2.sql("SELECT cosine_similarity(array(1.0F,0.0F), array(1.0F,0.0F)) c")
      .head().getDouble(0) == 1.0)
    assert(s2.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
