package graft

import graft.operators.Rm3

/** Pins the RM3 expansion pipeline on a corpus where the feedback mining
  * and the second-round re-ranking are hand-computable — including the
  * recall case expansion exists for: a document sharing only the TOPIC
  * vocabulary (no original query term) enters the round-2 results.
  */
class Rm3Spec extends SparkSpec {
  import spark.implicits._

  // query: {ml}. Docs 1-2 are about ml+gpu (feedback set), doc 3 is gpu-only
  // (invisible to round 1, reachable after expansion), doc 4 is noise.
  private lazy val docs = Seq(
    (1L, "ml gpu model ml"),
    (2L, "ml gpu gpu train"),
    (3L, "gpu gpu gpu train"),
    (4L, "cats dogs birds fish")
  ).toDF("doc_id", "text")

  test("expandedQuery: mines top non-query terms from the feedback docs") {
    // fbK=2 -> docs 1,2 (only docs containing 'ml'; doc 1 tf=2 ranks first).
    // Their non-'ml' terms: gpu:3, model:1, train:1 -> m=2 picks gpu, then
    // model/train tie at 1 -> alphabetical -> model.
    val q = Rm3.expandedQuery(docs, "doc_id", "text", Seq("ml"), fbK = 2, m = 2)
    assert(q == Map("ml" -> 2L, "gpu" -> 1L, "model" -> 1L))
  }

  test("searchExpanded: expansion reaches vocabulary-only documents") {
    val out = Rm3.searchExpanded(docs, "doc_id", "text", Seq("ml"), k = 4,
      fbK = 2, m = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round-2 scores: d1 = 2*2(ml) + 1(gpu) + 1(model) = 6,
    // d2 = 2 + 2 = 4, d3 = 3 (gpu only — NEW vs round 1), d4 absent
    assert(out == Seq((1L, 6L), (2L, 4L), (3L, 3L)))
  }

  test("expandedQuery: m = 0 degenerates to the weighted original query") {
    val q = Rm3.expandedQuery(docs, "doc_id", "text", Seq("ml"), fbK = 2,
      m = 0, origW = 5L)
    assert(q == Map("ml" -> 5L))
  }

  test("expansion never re-adds an original term") {
    // every feedback doc is mostly 'ml' — the exclusion must hold anyway
    val q = Rm3.expandedQuery(docs, "doc_id", "text", Seq("ml", "gpu"),
      fbK = 2, m = 3)
    assert(!q.keys.exists(t => (t == "ml" && q(t) != 2L) || (t == "gpu" && q(t) != 2L)))
    assert(q("ml") == 2L && q("gpu") == 2L)
    assert(q.size <= 2 + 3)
  }
}
