package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language ID on clear sentences") {
    val df = Seq(
      ("en", "the cat is in the house and it is happy"),
      ("de", "der hund ist nicht in das haus und die katze"),
      ("es", "el perro y la casa de los amigos es grande"),
      ("fr", "le chien est dans la maison et les amis"),
      ("und", "zxcv qwerty asdf")
    ).toDF("expected", "text")
    val got = df.select(col("expected"),
      TextAnalysis.langIdGuess(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("one two three", "superlongword ok").toDF("t")
    val r = df.select(TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.bpeishTokenCount(col("t")).as("b")).collect()
    assert(r(0).getInt(0) == 3)
    assert(r(0).getLong(1) == 4L)  // ceil(3/4) + ceil(3/4) + ceil(5/4) = 1+1+2
    assert(r(1).getLong(1) == 5L)  // ceil(13/4) + ceil(2/4) = 4+1
  }

  test("repetition metrics: hand-computed fractions, zero-shuffle plan") {
    val df = Seq(
      (1L, "buy now buy now buy now"), // 6 words, 2 distinct; bigrams: "buy now"x3 "now buy"x2
      (2L, "all words here are unique"), // no repetition
      (3L, "single"),                    // 1 word: no bigrams
      (4L, "a a a a")                    // max repetition: dup 3/4, bigram "a a" 3/3
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 6 && got(1L).getLong(2) == 2)
    assert(got(1L).getDouble(3) == 4.0 / 6.0)
    assert(got(1L).getDouble(4) == 3.0 / 5.0)
    assert(got(1L).getBoolean(5))
    assert(got(2L).getDouble(3) == 0.0 && got(2L).getDouble(4) == 1.0 / 4.0)
    assert(!got(2L).getBoolean(5)) // 0.25 is NOT > 0.25: boundary excluded
    assert(got(3L).getDouble(4) == 0.0 && !got(3L).getBoolean(5))
    assert(got(4L).getDouble(3) == 0.75 && got(4L).getDouble(4) == 1.0)
    // the whole battery is per-row array math: no Exchange anywhere
    val plan = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition metrics shuffled:\n$plan")
  }

  test("quality metrics are exact counts") {
    val m = Seq("Hello, World! 42 the end.").toDF("t")
      .select(TextAnalysis.qualityMetrics(col("t")).as("m"))
      .select("m.n_chars", "m.n_tokens", "m.n_punct", "m.n_digits", "m.n_upper",
        "m.n_stopwords").head()
    assert(m.getInt(0) == 25)
    assert(m.getInt(1) == 5)
    assert(m.getInt(2) == 3) // , ! .
    assert(m.getInt(3) == 2) // 4 2
    assert(m.getInt(4) == 2) // H W
    assert(m.getInt(5) == 1) // "the"
  }

  test("quality score in [0,1] and rewards real prose over noise") {
    val df = Seq(
      ("prose", "the cat is in the house and it is a happy cat that likes to sit in the sun " * 3),
      ("noise", "!!!! 1234 ???? 5678 !!!! 91011 ....")
    ).toDF("name", "t")
    val scores = df.select(col("name"),
      TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("t"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores("prose") > scores("noise"))
  }

  test("rolling fingerprint is order-sensitive, content fingerprint is ws-insensitive") {
    val r = Seq("ab cd", "cd ab", "ab  cd").toDF("t")
      .select(TextAnalysis.rollingFingerprint(col("t")).as("roll"),
        TextAnalysis.contentFingerprint(col("t")).as("cf")).collect()
    assert(r(0).getLong(0) != r(1).getLong(0)) // order matters for rolling hash
    assert(r(0).getString(1) == r(2).getString(1)) // ws runs collapse
  }

  test("profile bundles all signals without shuffling") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val prof = TextAnalysis.profile(df, "text")
    assert(Seq("metrics", "quality_score", "lang_guess", "fingerprint",
      "n_tokens_bpeish").forall(prof.columns.contains))
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "profile must be shuffle-free")
  }

  test("compression ratio band-passes: repetitive << prose << noise; null/empty -> null") {
    val rng = new scala.util.Random(42)
    val noise = Array.fill(2000)((rng.nextInt(94) + 33).toChar).mkString
    val df = Seq(
      (1L, Seq.fill(500)("spam").mkString(" ")), // degenerate repetition
      (2L, ("the quick brown fox jumps over the lazy dog and then discusses " +
        "partitioning strategies for large analytical workloads ") * 10),
      (3L, noise),                                // incompressible
      (4L, null.asInstanceOf[String]),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val (rep, prose, rand) = (got(1L).get, got(2L).get, got(3L).get)
    assert(rep < 0.05, s"degenerate repetition should crush: $rep")
    assert(prose > rep * 5 && prose < 0.6, s"prose in the band: $prose")
    assert(rand > 0.8, s"noise near-incompressible: $rand")
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("compression ratio is deterministic across invocations and partitionings") {
    val docs = (1 to 64).map(i => (i.toLong, s"doc $i " * (i % 7 + 1))).toSeq
    val a = docs.toDF("doc_id", "text").repartition(1)
    val b = docs.toDF("doc_id", "text").repartition(8)
    def vals(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), TextAnalysis.compressionRatio(col("text")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vals(a) == vals(b))
  }
}
