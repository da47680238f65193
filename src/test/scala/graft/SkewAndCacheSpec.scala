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
