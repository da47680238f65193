package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary fitting + out-of-vocabulary (OOV) scoring — the tokenizer-prep
  * primitive of a pretraining pipeline: fit a top-V token vocabulary over the
  * corpus, then score every document by the fraction of its token
  * OCCURRENCES that fall outside it. High-OOV docs are the ones a fixed
  * tokenizer will shred into bytes (foreign scripts, code, noise), so the
  * OOV fraction is both a curation filter and the coverage report that
  * decides V itself.
  *
  * Determinism contract: the vocabulary is top-V by (occurrence count DESC,
  * token ASC) — the tie-break makes membership, and therefore every
  * downstream OOV number, a pure function of the corpus, independent of
  * partitioning (the same contract as every deterministic-sampling op in
  * [[Sampling]]).
  *
  * Scale shape: one corpus-linear shuffle to per-(doc, token) counts; BOTH
  * consumers — the global token totals and the per-doc join-back — aggregate
  * FROM that same subtree, so ReuseExchange computes and shuffles the
  * exploded token stream once (the [[Keywords]] / [[Boilerplate]] shared-
  * exchange shape; `sum(tf)` deliberately references tf's count so column
  * pruning cannot split the shared exchange). The totals aggregation is
  * vocabulary-bounded (sublinear in corpus size), the top-V is a
  * TakeOrderedAndProject (O(V) heap per partition, never a global sort),
  * and the fitted vocabulary BROADCASTS back — V·avgLen bytes, a few MB at
  * a realistic 100k-entry vocabulary.
  */
object Vocab {

  /** The fitted vocabulary: top-`v` tokens by corpus occurrence count,
    * ties broken by token ascending. Output: (token, n_occ).
    */
  def vocabulary(df: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v > 0, s"vocabulary size must be positive, got $v")
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(v)
  }

  /** Per-doc OOV stats against the top-`v` vocabulary fitted on `df`
    * itself: (idCol, n_tokens, n_oov, oov_frac). Counts are over token
    * occurrences, not distinct tokens. oov_frac = n_oov / n_tokens is a
    * single correctly-rounded division of two exact integers — bit-portable
    * across engines. Docs with null `textCol` have no token stream and are
    * absent from the output (the same null-text rule as the gram
    * pipelines).
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String, v: Int): DataFrame = {
    require(v > 0, s"vocabulary size must be positive, got $v")
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // totals aggregate FROM tf — sum(tf) keeps tf's count column referenced
    // on this branch, so the subtree stays column-identical to the join
    // side below and ReuseExchange shuffles the exploded corpus ONCE (the
    // measured Keywords/Boilerplate trap: a pruned narrower branch splits
    // the shared exchange into two corpus scans)
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(v)
      .select(col("token"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(lit(0L)))
          .as("n_oov"))
      .withColumn("oov_frac", col("n_oov").cast("double") / col("n_tokens"))
  }
}
