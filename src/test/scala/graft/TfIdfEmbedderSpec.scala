package graft

import graft.api.{IndexBuilder, SemanticSearch}
import graft.embed.TfIdfEmbedder
import graft.operators.Ann

class TfIdfEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    ("D1", "interval run speed training session"),
    ("D2", "easy recovery run in the park"),
    ("D3", "long ride up the mountain pass"),
    ("D4", "swim drills and breathing technique"),
    ("D5", "the the the common words everywhere")
  ).toDF("ID", "EMBED_STR")

  private lazy val embedder = TfIdfEmbedder.fit(corpus, "EMBED_STR", dim = 256)

  test("fit: idf shaped by document frequency (rare > common)") {
    assert(embedder.nDocs == 5)
    val runB = TfIdfEmbedder.bucket("run", 256)   // df = 2
    val theB = TfIdfEmbedder.bucket("the", 256)   // df >= 3
    val swimB = TfIdfEmbedder.bucket("swim", 256) // df = 1
    assert(embedder.idf(swimB) > embedder.idf(runB))
    assert(embedder.idf(runB) > embedder.idf(theB))
  }

  test("embed: deterministic, unit-norm, column form equals driver form") {
    val v1 = embedder.embed("interval run speed")
    assert(v1.toSeq == embedder.embed("interval run speed").toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val indexed = IndexBuilder.withEmbeddings(corpus, embedder)
      .select("EMBED_STR", "EMBEDDING").collect()
    indexed.foreach { r =>
      assert(r.getSeq[Float](1) == embedder.embed(r.getString(0)).toSeq)
    }
  }

  test("retrieval: tf-idf ranks the topically-matching doc first") {
    val index = IndexBuilder.withEmbeddings(corpus, embedder)
    val search = new SemanticSearch(index, embedder)
    val top = search.topK("swim breathing drills", 1).head()
    assert(top.getAs[String]("ID") == "D4")
    // idf down-weights the stopword-only doc for a content query
    val scores = search.topK("interval speed training", 5)
      .collect().map(r => r.getAs[String]("ID") -> r.getAs[Double]("SIMILARITY_SCORE")).toMap
    assert(scores("D1") > scores("D5"))
  }

  test("cross-embedder invariant: ordering semantics hold regardless of model") {
    val q = "recovery run park"
    val viaTfIdf = new SemanticSearch(
      IndexBuilder.withEmbeddings(corpus, embedder), embedder).topK(q, 1)
      .head().getAs[String]("ID")
    val hashing = graft.embed.HashingTfEmbedder(256)
    val viaHashing = new SemanticSearch(
      IndexBuilder.withEmbeddings(corpus, hashing), hashing).topK(q, 1)
      .head().getAs[String]("ID")
    assert(viaTfIdf == "D2" && viaHashing == "D2")
  }
}
