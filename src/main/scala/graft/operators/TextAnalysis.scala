package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything here is a pure `Column` expression (codegen'd built-ins only),
  * so the whole battery runs inside one whole-stage-codegen'd scan with
  * column pruning and no shuffle — the shape that survives a 100 TB corpus.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. Keeps empties out by splitting on runs. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct character k-shingles — the canonical MinHash input for text
    * dedup (robust to tokenization and word-order noise, unlike word
    * tokens). Texts shorter than k yield the single truncated shingle.
    * Pure per-row projection, built-ins only.
    */
  def charShingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => substr(text, i, lit(k))))

  /** Naive whitespace token count (single-space separated, keeps empties —
    * cross-engine reproducible shape).
    */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword-approximating token count: words + punctuation marks,
    * long words counted as ceil(len/4) subword pieces (the usual ~4 chars per
    * BPE token heuristic).
    */
  def bpeishTokenCount(text: Column): Column = {
    val words = split(text, "\\s+")
    aggregate(
      filter(words, w => length(w) > 0),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / lit(4.0)).cast("long"))
  }

  // Tiny per-language stopword anchors. A real pipeline swaps in fastText &
  // friends; the heuristic (count stopword hits per language, argmax) is the
  // standard cheap n-gram/lexicon approach and is fully expressible as
  // Column logic.
  val StopwordsEn = Seq("the", "a", "of", "and", "is", "to", "in")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val StopwordsEs = Seq("el", "la", "los", "de", "que", "y", "es")
  val StopwordsFr = Seq("le", "la", "les", "et", "est", "une", "dans")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Heuristic language ID over whitespace tokens: argmax of stopword hits,
    * 'und' (undetermined) when nothing matches, with ties broken by the fixed
    * order en > de > es > fr (deterministic).
    */
  def langIdGuess(text: Column): Column = {
    val t = tokens(text)
    val en = hitCount(t, StopwordsEn)
    val de = hitCount(t, StopwordsDe)
    val es = hitCount(t, StopwordsEs)
    val fr = hitCount(t, StopwordsFr)
    val best = greatest(en, de, es, fr)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(es === best, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Quality metrics bundle (all exact integer/length based):
    * n_chars, n_tokens, avg token length, punctuation count, digit count,
    * uppercase count, stopword hits.
    */
  def qualityMetrics(text: Column): Column = {
    // one fused byte scan (TextStats) instead of five regex passes; the
    // token identities are exact: size(split(s, " ")) = n_spaces + 1 and
    // length(regexp_replace(s, " ", "")) = n_chars - n_spaces
    // (equivalence property-tested in TextStatsSpec)
    val st = graft.functions.TextStats.textStats(text)
    val nChars = st.getField("n_chars")
    val nSpaces = st.getField("n_spaces")
    val nToks = nSpaces + 1
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      ((nChars - nSpaces).cast("double") / nToks).as("avg_token_len"),
      st.getField("n_punct").as("n_punct"),
      st.getField("n_digits").as("n_digits"),
      st.getField("n_upper").as("n_upper"),
      hitCount(tokens(text), StopwordsEn ++ StopwordsDe ++ StopwordsEs ++ StopwordsFr)
        .as("n_stopwords"))
  }

  /** Composite 0..1 quality score from the metrics struct: rewards
    * reasonable length, stopword presence, and low punctuation/digit noise.
    * Thresholding it is the "filter the crawl" primitive.
    */
  def qualityScore(m: Column): Column = {
    val lenScore = least(m("n_chars").cast("double") / lit(200.0), lit(1.0))
    val stopScore = least(m("n_stopwords").cast("double") * lit(10.0) /
      greatest(m("n_tokens").cast("double"), lit(1.0)), lit(1.0))
    val punctPenalty = least(m("n_punct").cast("double") * lit(4.0) /
      greatest(m("n_chars").cast("double"), lit(1.0)), lit(1.0))
    val digitPenalty = least(m("n_digits").cast("double") * lit(4.0) /
      greatest(m("n_chars").cast("double"), lit(1.0)), lit(1.0))
    (lenScore * lit(0.4) + stopScore * lit(0.4) +
      (lit(1.0) - punctPenalty) * lit(0.1) + (lit(1.0) - digitPenalty) * lit(0.1))
  }

  /** Content-addressed fingerprint: md5 of the whitespace-normalized,
    * lowercased text — the exact-dedup key that ignores formatting noise.
    */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Gopher-style within-document repetition metrics — the quality rule
    * that catches degenerate crawl text ("buy now buy now buy now...")
    * which length/punctuation scores miss:
    *
    *  - `dup_word_frac`: fraction of word occurrences that repeat an
    *    earlier word, `(n_words - n_distinct) / n_words`;
    *  - `top_bigram_frac`: the most frequent consecutive word pair's share
    *    of all bigrams, `max_bigram_count / (n_words - 1)` (0.0 for
    *    single-word docs);
    *  - `repetitive`: dup_word_frac > 0.5 OR top_bigram_frac > 0.25
    *    (dyadic thresholds — exact in both engines).
    *
    * Everything is per-row array math — bigram multiplicity is a
    * sort-then-longest-run fold over the in-row bigram array, NOT an
    * explode + groupBy — so the whole battery stays inside the scan's
    * whole-stage codegen with zero shuffle at any corpus size. Both
    * fractions divide two exact integers, so the doubles are bit-identical
    * across engines.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    // NB: sequence(0, -1) DESCENDS ([0, -1]) rather than yielding an empty
    // array, so the single-word case must be guarded explicitly
    val maxRun = // max multiplicity of an element in the sorted bigram array
      """aggregate(
        |  sort_array(if(size(__words) < 2, array(),
        |    transform(sequence(0, size(__words) - 2),
        |      i -> concat(__words[i], ' ', __words[i + 1])))),
        |  named_struct('prev', cast(null as string),
        |    'run', cast(0 as bigint), 'best', cast(0 as bigint)),
        |  (a, x) -> named_struct('prev', x,
        |    'run', if(a.prev is not null and x = a.prev, a.run + 1, cast(1 as bigint)),
        |    'best', greatest(a.best,
        |      if(a.prev is not null and x = a.prev, a.run + 1, cast(1 as bigint)))),
        |  a -> a.best)""".stripMargin
    df.withColumn("__words", words)
      .withColumn("n_words", size(col("__words")).cast("long"))
      .withColumn("n_distinct_words",
        size(array_distinct(col("__words"))).cast("long"))
      .withColumn("__top_bigram", expr(maxRun))
      .select(col(idCol), col("n_words"), col("n_distinct_words"),
        ((col("n_words") - col("n_distinct_words")).cast("double")
          / col("n_words")).as("dup_word_frac"),
        when(col("n_words") < 2, lit(0.0))
          .otherwise(col("__top_bigram").cast("double") / (col("n_words") - 1))
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > 0.5 || col("top_bigram_frac") > 0.25)
  }

  /** Order-sensitive rolling-hash fingerprint (see [[graft.functions.PolyHash]]). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.TextHashFunctions.polyHash(text)

  /** Deflate compression ratio — the Gopher-style "too repetitive / too
    * random" quality signal (compressed bytes / UTF-8 bytes): templated or
    * looping text compresses far below normal prose, random noise sits near
    * (or above) 1.0, so curation band-passes the ratio. No Catalyst
    * equivalent exists, so this is one of the engine's few sanctioned UDFs
    * (the embedder rule): per-THREAD `Deflater` reuse via ThreadLocal — an
    * executor core allocates one native zlib stream ever, not one per row —
    * and a fixed compression level so the signal is stable run-to-run.
    * Null and empty text → null (no byte stream to measure).
    *
    * Determinism note: deflate output length is deterministic for a given
    * zlib build + level; across DIFFERENT zlib builds the length may vary
    * by a few bytes, so the signal is model-relative like the embedder
    * (spec-verified ordering properties, no cross-engine oracle — DuckDB
    * has no deflate to mirror anyway).
    */
  def compressionRatio(text: Column): Column =
    TextAnalysis.compressionRatioUdf(text)

  private lazy val deflaterPool: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true) // raw deflate, no zlib header
    }

  private lazy val compressionRatioUdf = udf { (s: String) =>
    if (s == null || s.isEmpty) null
    else {
      val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = deflaterPool.get()
      d.reset()
      d.setInput(in)
      d.finish()
      val chunk = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(chunk)
      java.lang.Double.valueOf(total.toDouble / in.length)
    }
  }

  /** Full document-profile projection over a corpus. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val m = qualityMetrics(col(textCol))
    df.withColumn("metrics", m)
      .withColumn("quality_score", qualityScore(col("metrics")))
      .withColumn("lang_guess", langIdGuess(col(textCol)))
      .withColumn("fingerprint", contentFingerprint(col(textCol)))
      .withColumn("n_tokens_bpeish", bpeishTokenCount(col(textCol)))
  }
}
