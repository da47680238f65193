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

  /** Order-sensitive rolling-hash fingerprint (see [[graft.functions.PolyHash]]). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.TextHashFunctions.polyHash(text)

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
