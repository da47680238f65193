package graft

import graft.operators.Fuzzy

/** Pins the SymSpell deletion-neighborhood matcher: the join must find
  * EXACTLY the naive thresholded-levenshtein matches (the neighborhood
  * property means the equi-join loses nothing at distance 1) across all
  * four edit classes, and extra vocab columns ride through.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val terms = Seq("stream", "strum", "steam", "dup", "dupe", "up",
    "query", "quark", "a", "ab", "vector")

  test("matchTerms == naive thresholded levenshtein over the whole vocab") {
    val vocab = terms.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("term", "df")
    val queries = Seq("strem", // deletion of 'a' from steam / 'a' in stream
      "dup",   // exact (+dupe by insertion, up? lev(dup,up)=1 deletion)
      "quer",  // deletion from query
      "b",     // substitution of a / deletion from ab
      "zz")    // nothing
    val got = Fuzzy.matchTerms(vocab, "term", queries)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = (for {
      q <- queries
      (t, i) <- terms.zipWithIndex
      if lev(q, t) <= 1
    } yield (q, t, i.toLong)).toSet
    assert(got == want, s"matcher diverged:\n got=$got\nwant=$want")
    assert(want.exists(_._1 == "strem") && !want.exists(_._1 == "zz"))
  }

  test("matchTerms: duplicate query terms collapse; empty queries -> empty frame") {
    val vocab = terms.toDF("term")
    val dup = Fuzzy.matchTerms(vocab, "term", Seq("dup", "dup")).collect()
    assert(dup.map(_.getString(0)).forall(_ == "dup"))
    assert(dup.length == dup.distinct.length)
    val none = Fuzzy.matchTerms(vocab, "term", Nil)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("query_term", "term"))
  }
}
