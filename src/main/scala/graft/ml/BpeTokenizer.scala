package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted byte-pair-encoding tokenizer (Sennrich et al. 2016, the
  * word-frequency-dictionary form every production tokenizer trainer
  * uses) — upgrades the engine's token-counting battery (whitespace +
  * BPE-ish regex, q16) to a REAL learned subword vocabulary.
  *
  * Scale split, same as [[QualityClassifier]] / the embedder: the merge
  * table is FIT on the corpus's (word, count) dictionary — one
  * vocabulary-bounded shuffle with map-side combine, optionally capped to
  * the top `maxWordTypes` types by (count desc, word asc), then a
  * driver-side loop over the dict (O(merges · types · avgLen), seconds for
  * a 1M-type dict — the dict is corpus-size-INDEPENDENT) — and APPLIED
  * map-side: the merge table broadcasts with the closure and every
  * document tokenizes inside its own scan partition (model-bound UDF, the
  * SURVEY §2.10 embedder rule; a per-word memo cache amortizes repeated
  * words within a partition).
  *
  * Determinism: merge selection breaks count ties by pair lexicographic
  * order, and the fitted dict is exact counts — so the merge table is a
  * pure function of the corpus, independent of partitioning.
  * Verification is model-relative (the merge table has no closed SQL
  * form): the classic low/lower/newest/widest fixture's merge sequence is
  * hand-computed in spec, apply parity driver≡distributed, and
  * detokenization round-trips.
  */
object BpeTokenizer {

  /** End-of-word sentinel (kept out of the corpus alphabet by
    * construction: words are whitespace tokens and never contain "</w>").
    */
  val Eow = "</w>"

  /** Corpus (word, n) dictionary — the fit input. One shuffle,
    * vocabulary-bounded output.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Fits `numMerges` BPE merges on `df`'s word dictionary (capped at the
    * top `maxWordTypes` word types by (count desc, word asc) — the cap is
    * what bounds the driver collect at any corpus size).
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int,
          maxWordTypes: Int = 1 << 20): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(maxWordTypes > 0, s"maxWordTypes must be positive: $maxWordTypes")
    val dict = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWordTypes)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    fitFromDict(dict.toSeq, numMerges)
  }

  /** The driver-side trainer, exposed for spec fixtures. */
  def fitFromDict(dict: Seq[(String, Long)], numMerges: Int): BpeModel = {
    var words: Map[Vector[String], Long] = dict.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Eow) -> c
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties by pair lexicographic ASC — deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => mergePair(syms, best) -> c }
        i += 1
      }
    }
    new BpeModel(merges.result())
  }

  /** One left-to-right merge pass of `pair` over a symbol sequence. */
  private[ml] def mergePair(syms: Vector[String],
                            pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }
}

/** The fitted merge table + its application paths. */
final class BpeModel(val merges: Seq[(String, String)]) extends Serializable {
  import BpeTokenizer.{mergePair, Eow}

  private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** BPE-encodes one word (no whitespace) to subword tokens; the last
    * token carries the end-of-word sentinel.
    */
  def encodeWord(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      // lowest-rank applicable pair merges first — the standard apply rule
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        rank.get((syms(j), syms(j + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; best = (syms(j), syms(j + 1))
          case _ => ()
        }
        j += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** Whitespace-splits and BPE-encodes a document. Null-safe (null → no
    * tokens), mirroring the gram pipelines' null-text rule.
    */
  def encode(text: String): Seq[String] =
    if (text == null) Nil
    else text.split(" ", -1).iterator.filter(_.nonEmpty)
      .flatMap(encodeWord).toSeq

  /** Distributed apply: subword tokens as `array<string>`. Model-bound
    * UDF (embedder rule) with a per-executor word memo — repeated words
    * (the common case by Zipf) hit the cache, not the merge loop.
    */
  def tokensCol(text: Column): Column = {
    val self = this
    val enc = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else s.split(" ", -1).iterator.filter(_.nonEmpty)
        .flatMap(BpeModel.memo(self, _)).toSeq
    }
    enc(text)
  }

  /** Per-doc subword stats: (idCol, n_words, n_bpe_tokens, fertility =
    * subwords per word — THE tokenizer-quality metric a vocab-size sweep
    * optimizes).
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokensCol(col(textCol))
    df.select(col(idCol),
        size(filter(split(coalesce(col(textCol), lit("")), " "),
          w => w =!= "")).cast("long").as("n_words"),
        size(toks).cast("long").as("n_bpe_tokens"))
      .withColumn("fertility",
        when(col("n_words") === 0L, lit(null).cast("double"))
          .otherwise(col("n_bpe_tokens").cast("double") / col("n_words")))
  }
}

object BpeModel {
  // per-JVM word→tokens memo, keyed by model identity (executors reuse the
  // broadcast model instance, so the cache is shared across a partition's
  // rows and bounded per model by the corpus word-type count)
  private val caches =
    new java.util.concurrent.ConcurrentHashMap[BpeModel,
      java.util.concurrent.ConcurrentHashMap[String, Seq[String]]]()

  private[ml] def memo(m: BpeModel, word: String): Seq[String] = {
    val c = caches.computeIfAbsent(m,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]())
    var v = c.get(word)
    if (v == null) { v = m.encodeWord(word); c.put(word, v) }
    v
  }
}
