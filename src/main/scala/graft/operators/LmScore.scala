package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model rarity scoring — the KenLM-style fluency filter of
  * a pretraining pipeline (score each document against an n-gram LM trained
  * on the corpus itself; documents dominated by improbable token
  * transitions are OCR garbage, lists, or boilerplate soup), expressed in
  * the engine's oracle-portable arithmetic: every per-bigram conditional
  * probability is ONE division of two exact integers — add-one smoothing
  *
  *   p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
  *
  * — so the score components (counts, a correctly-rounded IEEE division,
  * comparisons, min) are bit-identical across engines with NO libm call
  * (the q128 lift rule: a log-perplexity output would drag engine-specific
  * `log` ulps into the gate; rarity rate + min-probability carry the same
  * filtering signal rationally).
  *
  * Scale shape: token and bigram occurrence streams are corpus-linear; the
  * count tables aggregate with map-side partials, and scoring joins the
  * bigram stream back on (w1, w2) and w1 — shuffles keyed on grams, never
  * a cross product; the vocabulary size V rides along as a broadcast
  * 1-row literal. At 100 TB the count tables themselves get big; the
  * production variant truncates to top-K counts + backoff (the
  * [[Vocab]] Misra-Gries machinery composes here), while this exact form
  * stays the gated one.
  */
object LmScore {

  /** Per-doc bigram rarity profile: `n_bigrams` (token transitions in the
    * doc, occurrence-counted — NOT per-doc-distinct like the dedup gram
    * family), `n_rare` (transitions with smoothed conditional probability
    * below `rareMaxP`), `rare_frac`, and `min_p` (the least probable
    * transition). Docs with fewer than 2 tokens keep a row with
    * `n_bigrams = 0` and null fractions.
    */
  def bigramRarity(df: DataFrame, idCol: String, textCol: String,
                   rareMaxP: Double = 1e-3): DataFrame = {
    val toks: Column = split(col(textCol), " ")
    // occurrence streams: zip-with-shifted-self emits (w1, w2) per position
    // (slice length 0 when size < 2 — no sequence() descending-range trap)
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigramArr = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val tokStream = df.select(explode(toks).as("w"))
    val bigStream = df.select(col(idCol), explode(bigramArr).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = tokStream.groupBy("w").agg(count(lit(1)).as("c1"))
    // V folds into the plan as a literal (the engine's 1-row-side rule —
    // same as query vectors and centroids): a broadcast cross join of the
    // 1-row aggregate would plan a BroadcastNestedLoopJoin, the shape the
    // whole-surface plan audit forbids. One constant-size driver job.
    val vocabSize = uni.count()
    val bc = bigStream.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val scored = bigStream
      .join(bc, Seq("w1", "w2"))
      .join(uni, bigStream("w1") === uni("w"))
      .withColumn("p",
        (col("c12") + 1).cast("double") /
          (col("c1") + lit(vocabSize)).cast("double"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("p") < rareMaxP, 1L).otherwise(0L)).as("n_rare"),
        min(col("p")).as("min_p"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_bigrams"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        col("rare_frac"), col("min_p"))
  }
}
