package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate / template detection — the C4-style "repeated content"
  * curation pass: a word n-gram occurring in >= `minDocs` DISTINCT
  * documents is boilerplate (navigation chrome, license headers, template
  * text), and each document is scored by the fraction of its distinct
  * n-grams that are boilerplate. Thresholding that fraction drops
  * template-dominated docs; the gram table itself is the corpus's
  * boilerplate inventory.
  *
  * Scale shape: ONE corpus-linear shuffle on the gram hash, shared by both
  * consumers — the frequency aggregation and the join back to per-doc rows
  * are built from the same repartitioned subtree, so ReuseExchange
  * computes and shuffles the exploded gram table once. Per-gram state is a
  * doc count (map-side partial agg); per-doc state is two counters. At
  * true 100 TB, [[statsApprox]] swaps the exact two-pass scheme for a
  * broadcast Count-Min sketch of gram frequencies — no gram shuffle at
  * all — at the cost of bounded overcounting; the exact form stays the
  * gated one because its outputs are oracle-checkable.
  */
object Boilerplate {

  /** Per-doc boilerplate stats: (idCol, n_grams, n_boiler, boiler_frac)
    * over distinct word n-grams ([[Dedup.wordNgrams]] semantics, hashed to
    * longs like every gram pipeline in this engine).
    */
  def stats(df: DataFrame, idCol: String, textCol: String,
            n: Int = 3, minDocs: Int = 5): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val grams = df
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
      .repartition(parts, col("gram_h")) // the ONE shared corpus shuffle
    // (gram, doc) rows are already distinct — wordNgrams dedups per doc —
    // so countDistinct(id) ≡ count(1) in VALUE here; countDistinct is kept
    // deliberately: it keeps idCol in the aggregation's input, making this
    // subtree column-identical to the join side below, so ReuseExchange
    // shuffles the exploded corpus ONCE (a plain count lets column pruning
    // narrow this side and the shared exchange splits into two corpus
    // scans — measured, not theoretical)
    val common = grams.groupBy(col("gram_h"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("gram_h"), lit(1).as("is_boiler"))
    grams.join(common, Seq("gram_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0))).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams"))
  }

  /** One-pass approximate variant — the true-100 TB leg: a Count-Min
    * sketch of gram-hash frequencies is built in a single scan (per-
    * partition sketches merged, never the grams) and broadcast; each doc
    * is then scored map-side against the sketch inside its own
    * aggregation scan. The corpus-linear gram-hash SHUFFLE of the exact
    * form disappears entirely — the only exchange left is the per-doc
    * rollup on `idCol`.
    *
    * Accuracy contract (standard CMS): estimates never UNDERcount, so
    * every true boilerplate gram (>= `minDocs` docs) is always flagged —
    * zero false negatives; a gram is falsely flagged only when its
    * overcount reaches `minDocs - true_count`, and overcount <= eps * N
    * (N = total gram occurrences) with probability >= `confidence`,
    * per lookup. Since wordNgrams emits per-doc-distinct grams, sketch
    * counts estimate DOC frequency, same as the exact form's
    * countDistinct. Sketch size ~ (2/eps) * ln(1/(1-confidence)) longs,
    * independent of corpus size.
    */
  def statsApprox(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, minDocs: Int = 5,
                  eps: Double = 1e-4, confidence: Double = 0.99,
                  seed: Int = 42): DataFrame = {
    val grams = df
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    val cms = grams.stat.countMinSketch(col("gram_h"), eps, confidence, seed)
    val bc = df.sparkSession.sparkContext.broadcast(cms)
    val minD = minDocs.toLong
    // a UDF is unavoidable here: the sketch lookup has no Catalyst
    // equivalent, and it replaces a corpus-sized shuffle — the one trade
    // where a non-codegen call is the cheaper side
    val isBoiler = udf((h: Long) => bc.value.estimateCount(h) >= minD)
    grams
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(isBoiler(col("gram_h")), 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams"))
  }
}
