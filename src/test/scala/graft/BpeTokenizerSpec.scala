package graft

import org.apache.spark.sql.functions._

import graft.ml.{BpeModel, BpeTokenizer}

/** Model-relative verification for the fitted BPE tokenizer: the classic
  * low/lower/newest/widest fixture's merge sequence is hand-computed, the
  * apply rule reproduces the textbook segmentation of an UNSEEN word,
  * driver and distributed paths agree pointwise, and detokenization
  * round-trips.
  */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al.'s fixture. Round-1 pair counts put (e,s)=(s,t)=(t,</w>)
  // at 9; the lexicographic tie-break picks (e,s), then (es,t),
  // (est,</w>); then (l,o)=(o,w)=7 resolves to (l,o), then (lo,w).
  private lazy val fixtureDict = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fit: hand-computed merge sequence with deterministic tie-break") {
    val m = BpeTokenizer.fitFromDict(fixtureDict, numMerges = 5)
    assert(m.merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("encode: textbook segmentation of an unseen word") {
    val m = BpeTokenizer.fitFromDict(fixtureDict, numMerges = 5)
    assert(m.encodeWord("lowest") == Seq("low", "est</w>"))
    assert(m.encode("lowest newest") == Seq("low", "est</w>", "n", "e", "w", "est</w>"))
  }

  test("fit from a DataFrame corpus equals fit from its word dict; partitioning-independent") {
    val docs = Seq(
      "low low low low low newest newest newest",
      "lower lower newest newest newest widest",
      "widest widest").toDF("text")
    val a = BpeTokenizer.fit(docs, "text", numMerges = 5)
    val b = BpeTokenizer.fit(docs.repartition(7), "text", numMerges = 5)
    assert(a.merges == b.merges)
    assert(a.merges == BpeTokenizer.fitFromDict(fixtureDict, 5).merges)
  }

  test("distributed apply ≡ driver apply; null/empty rows are token-free, not errors") {
    val m = BpeTokenizer.fitFromDict(fixtureDict, numMerges = 5)
    val docs = Seq((1L, "lowest newest low"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "unrelated zz")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), m.tokensCol(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == m.encode("lowest newest low"))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(got(4L) == m.encode("unrelated zz"))
  }

  test("detokenization round-trips: join tokens, split on the sentinel") {
    val m = BpeTokenizer.fitFromDict(fixtureDict, numMerges = 5)
    val text = "lowest newest low wider"
    val rebuilt = m.encode(text).mkString
      .replace(BpeTokenizer.Eow, " ").trim
    assert(rebuilt == text)
  }

  test("tokenStats: fertility = subwords per word; empty doc yields null fertility") {
    val m = BpeTokenizer.fitFromDict(fixtureDict, numMerges = 5)
    val docs = Seq((1L, "lowest newest"), (2L, "")).toDF("doc_id", "text")
    val got = m.tokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    // lowest -> [low, est</w>] (2), newest -> [n,e,w,est</w>] (4)
    assert(got(1L) == ((2L, 6L, Some(3.0))))
    assert(got(2L) == ((0L, 0L, None)))
  }

  test("zero merges degenerate to characters + sentinel; merges exhaust early on a tiny dict") {
    val m0 = BpeTokenizer.fitFromDict(Seq(("ab", 1L)), numMerges = 0)
    assert(m0.encodeWord("ab") == Seq("a", "b", "</w>"))
    // 2-char word has only 2 pairs + 1 after each merge: requesting 100
    // merges must stop when the word collapses to one symbol
    val mX = BpeTokenizer.fitFromDict(Seq(("ab", 3L)), numMerges = 100)
    assert(mX.merges.size <= 2)
    assert(mX.encodeWord("ab") == Seq("ab</w>"))
  }
}
