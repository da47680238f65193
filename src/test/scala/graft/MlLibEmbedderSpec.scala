package graft

import graft.api.{IndexBuilder, SemanticSearch}
import graft.embed.MlLibEmbedder

class MlLibEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    ("D1", "interval run speed training session"),
    ("D2", "easy recovery run in the park"),
    ("D3", "long ride up the mountain pass"),
    ("D4", "swim drills and breathing technique"),
    ("D5", "the the the common words everywhere")
  ).toDF("ID", "EMBED_STR")

  private lazy val embedder = MlLibEmbedder.fit(corpus, "EMBED_STR", dim = 256)

  test("batch pipeline output equals the driver-side embed, pointwise exact") {
    val batch = embedder.transformCorpus(corpus, "EMBED_STR")
      .select("EMBED_STR", "EMBEDDING").collect()
    assert(batch.length == 5)
    batch.foreach { r =>
      assert(r.getSeq[Float](1) == embedder.embed(r.getString(0)).toSeq,
        s"pipeline/driver mismatch for: ${r.getString(0)}")
    }
  }

  test("embedCol (UDF form) equals embed; vectors unit-norm and deterministic") {
    val indexed = IndexBuilder.withEmbeddings(corpus, embedder)
      .select("EMBED_STR", "EMBEDDING").collect()
    indexed.foreach { r =>
      assert(r.getSeq[Float](1) == embedder.embed(r.getString(0)).toSeq)
    }
    val v = embedder.embed("interval run speed")
    assert(v.toSeq == embedder.embed("interval run speed").toSeq)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(v.length == 256)
  }

  test("idf is fitted: rare terms outweigh corpus-wide terms") {
    // 'the' appears in 3 docs, 'swim' in 1; both must land in some bucket
    // with the smoothed log((m+1)/(df+1)) weighting
    val htf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(256)
    assert(embedder.idf(htf.indexOf("swim")) > embedder.idf(htf.indexOf("the")))
  }

  test("retrieval through the standard search path works end-to-end") {
    val index = IndexBuilder.withEmbeddings(corpus, embedder)
    val top = new SemanticSearch(index, embedder).topK("swim breathing drills", 1).head()
    assert(top.getAs[String]("ID") == "D4")
  }

  test("null and empty text embed to the zero vector in both paths") {
    assert(embedder.embed(null).forall(_ == 0f))
    assert(embedder.embed("").forall(_ == 0f))
    val out = embedder.transformCorpus(
        Seq(("N1", null: String), ("N2", "")).toDF("ID", "EMBED_STR"), "EMBED_STR")
      .select("EMBEDDING").collect()
    out.foreach(r => assert(r.getSeq[Float](0).forall(_ == 0f)))
  }
}
