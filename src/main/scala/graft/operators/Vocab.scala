package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** Mergeable Misra-Gries heavy-hitters summary over tokens — the
    * one-pass bounded-state engine behind [[vocabularyApprox]]. Per-buffer
    * state is a counter map capped at `capacity` entries; overflow on
    * insert decrements every counter (classic MG), overflow on merge
    * subtracts the (capacity+1)-th largest count from all (Agarwal et
    * al.'s mergeable form). Guarantees: estimates UNDERCOUNT by at most
    * N/(capacity+1) (N = total token occurrences), so every token with
    * true count > N/(capacity+1) survives; and while `capacity` ≥ the
    * number of distinct tokens no eviction ever fires and every count is
    * EXACT — the oracle-able exactness window, same contract as the GK/CMS
    * legs (q51/q88/q89).
    */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(c) => b.updated(t, c + 1L)
        case None if b.size < capacity => b.updated(t, 1L)
        case None =>
          // decrement-all: the incoming token's +1 cancels against its own
          // decrement, so it is simply not inserted; zeros evict
          b.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (s.size <= capacity) s
      else {
        // subtract the (capacity+1)-th largest count; at most `capacity`
        // strictly larger values can remain
        val d = s.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
        s.flatMap { case (k, v) => if (v - d > 0L) Some(k -> (v - d)) else None }
      }
    }
    def finish(r: Map[String, Long]): Seq[(String, Long)] = r.toSeq
    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** One-pass approximate vocabulary — the true-100 TB leg of
    * [[vocabulary]]: the exact form's corpus-linear token shuffle is
    * replaced by ONE global Misra-Gries aggregation whose partial buffers
    * (O(capacity) each, one per partition) merge up a tiny final exchange
    * — the token stream itself never shuffles. Same output schema and the
    * same (count desc, token asc) tie-break. Within the exactness window
    * (`capacity` ≥ distinct tokens — realistic: capacity millions vs a
    * corpus vocabulary) the result is IDENTICAL to [[vocabulary]];
    * past it, top-V membership is heavy-hitter-approximate and
    * merge-order-dependent, with the undercount bound above.
    */
  def vocabularyApprox(df: DataFrame, textCol: String, v: Int,
                       capacity: Int = 1 << 20): DataFrame = {
    require(v > 0, s"vocabulary size must be positive, got $v")
    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    df.select(explode(split(col(textCol), " ")).as("token"))
      .agg(mg(col("token")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("n_occ"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(v)
  }

  /** Per-GROUP heavy hitters — [[vocabularyApprox]] stratified (top tokens
    * per source/domain/lang, the per-domain audit view): ONE hash agg keyed
    * on the group whose state is an O(capacity) Misra-Gries buffer per
    * group, map-side merged — the token stream still never shuffles, only
    * (group, sketch) partials do. The per-group top-k then ranks the
    * exploded sketch output, which is ≤ capacity rows per group (NOT the
    * corpus), so the window is bounded by the sketch, not the data — the
    * same shape [[Keywords.topTerms]] uses over its per-doc candidates.
    * Exactness window as [[vocabularyApprox]]: capacity ≥ a group's
    * distinct tokens ⇒ identical to the exact per-group counts.
    */
  def heavyHittersByGroup(df: DataFrame, groupCol: String, textCol: String,
                          k: Int, capacity: Int = 1 << 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    val perGroup = df
      .select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol)).agg(mg(col("token")).as("hh"))
      .select(col(groupCol), explode(col("hh")).as("e"))
      .select(col(groupCol), col("e._1").as("token"), col("e._2").as("n_occ"))
    val rank = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
        .orderBy(col("n_occ").desc, col("token").asc))
    perGroup.withColumn("rnk", rank.cast("long")).where(col("rnk") <= k)
  }

  /** [[oovStats]] with the vocabulary fitted by [[vocabularyApprox]] —
    * per-doc scoring joins the broadcast sketch-fitted vocab and rolls up
    * on the id only: the ONLY corpus-keyed shuffle left is the per-doc
    * aggregation (map-side combined); nothing is ever shuffled by token.
    */
  def oovStatsApprox(df: DataFrame, idCol: String, textCol: String, v: Int,
                     capacity: Int = 1 << 20): DataFrame = {
    val vocab = vocabularyApprox(df, textCol, v, capacity)
      .select(col("token"), lit(1).as("in_vocab"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Bounded inverted-index postings: per term, the top-`k` documents by
    * term frequency (ties to the lower doc id) — the retrieval-index
    * structure with the UNBOUNDED half removed: a full posting list is
    * O(docs) per stopword and a `collect_list` time bomb at corpus scale;
    * the k-best-by-tf prefix is what a scoring-time index actually serves
    * first. Shape: one (term, doc) tf aggregation, then the
    * [[graft.operators.Ann.TopKAgg]] bounded heap per term — O(k) state
    * map-side, never a per-term sort of the whole posting list.
    */
  def topPostings(df: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val topk = udaf(new graft.operators.Ann.TopKAgg(k),
      Encoders.product[graft.operators.Ann.Scored])
    df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .where(col(idCol).isNotNull)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(topk(col("tf").cast("double"), col(idCol).cast("long")).as("top"))
      .select(col("term"), posexplode(col("top")))
      .select(col("term"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.score").cast("long").as("tf"))
  }
}
