package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher document-quality rule set (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv:2112.11446, Appendix A — the filter battery MassiveWeb popularized
  * and most open pipelines since have copied): word-count bounds, mean word
  * length, symbol-to-word ratio, bullet/ellipsis line shares, alphabetic-
  * word fraction, and a stop-word floor, evaluated per document with the
  * per-rule verdicts exposed (a curation pipeline wants to KNOW which rule
  * fired, not just that one did).
  *
  * Everything is a map-side codegen projection over one `split` of the text
  * — no shuffle, no UDF. Ratios are single IEEE divisions of exact integer
  * counts (the engine's oracle-portability rule); the repetition rules from
  * the same paper (duplicate line / top-n-gram shares) already live in
  * [[graft.functions.TextAnalysis]] (q76/q77) and compose by join.
  */
object GopherRules {

  /** The paper's stop-word probe list (A1): a document with fewer than
    * `minStopwords` of these as whitespace tokens is likely not prose.
    */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule profile + verdicts. Thresholds default to the
    * paper's: 50..100000 words, mean word length 3..10, symbol ratio
    * <= 0.1, bullet lines <= 0.9, ellipsis lines <= 0.3, >= 80% words with
    * an alphabetic character, >= 2 stop words. `keep` = all rules pass.
    */
  def profile(df: DataFrame, idCol: String, textCol: String,
              minWords: Int = 50, maxWords: Int = 100000,
              minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
              maxSymbolRatio: Double = 0.1,
              maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
              minAlphaFrac: Double = 0.8, minStopwords: Int = 2): DataFrame = {
    val words = split(col(textCol), " ")
    val lines = split(col(textCol), "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    // chars excluding the single separator per gap = sum of word lengths
    val wordChars = (length(col(textCol)) - (nWords - 1L)).cast("long")
    // '#' chars plus non-overlapping '...' runs — each replace removes
    // exactly its match, so the /3 is an exact integer in double
    val nHash = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val nEllSym = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val nSymbols = (nHash + nEllSym).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("long")
    val nEllipsis = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nAlphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(words,
      w => lower(w).isin(StopWords.map(x => x: Any): _*))).cast("long")

    val meanWordLen = wordChars.cast("double") / nWords
    val symbolRatio = nSymbols.cast("double") / nWords
    val bulletFrac = nBullet.cast("double") / nLines
    val ellipsisFrac = nEllipsis.cast("double") / nLines
    val alphaFrac = nAlphaWords.cast("double") / nWords

    val passWords = nWords >= minWords && nWords <= maxWords
    val passLen = meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen
    val passSymbol = symbolRatio <= maxSymbolRatio
    val passBullet = bulletFrac <= maxBulletFrac
    val passEllipsis = ellipsisFrac <= maxEllipsisFrac
    val passAlpha = alphaFrac >= minAlphaFrac
    val passStop = nStop >= minStopwords

    df.select(col(idCol), nWords.as("n_words"),
      meanWordLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"), nStop.as("n_stopwords"),
      passWords.as("pass_words"), passLen.as("pass_word_len"),
      passSymbol.as("pass_symbol"), passBullet.as("pass_bullet"),
      passEllipsis.as("pass_ellipsis"), passAlpha.as("pass_alpha"),
      passStop.as("pass_stopwords"),
      (passWords && passLen && passSymbol && passBullet && passEllipsis
        && passAlpha && passStop).as("keep"))
  }
}
