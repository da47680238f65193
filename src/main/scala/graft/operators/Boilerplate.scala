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
  * true 100 TB, the exact two-pass scheme can be swapped for a broadcast
  * Count-Min sketch of hot grams (approximate, one pass) — the exact form
  * is kept here because its outputs are oracle-checkable.
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
}
