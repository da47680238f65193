package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repeated-SPAN detection and removal — the ExactSubstr dedup family
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): a k-token window occurring verbatim in `minDocs`+ distinct
  * documents marks a duplicated span; overlapping shared windows merge
  * into maximal spans. Unlike doc-level dedup (which keeps or drops whole
  * rows) this finds the memorization-prone verbatim REGIONS — license
  * headers, quoted passages, syndicated paragraphs — inside otherwise
  * unique documents, and [[stripRepeatedSpans]] rewrites the text with
  * those regions removed (the C4 "remove repeated lines" move, at token
  * rather than line granularity, since span boundaries need no newline
  * structure).
  *
  * Scale shape mirrors [[Boilerplate.stats]]: ONE corpus-linear positional
  * gram shuffle (n_tokens rows per doc), shared by the frequency
  * aggregation and the coverage join-back via ReuseExchange; the
  * per-doc span arithmetic (interval merge, island count) happens IN-ROW
  * on the collected position set — no window functions, no per-doc sort
  * task, state bounded by the doc's own covered-token count. Gram
  * identity travels as md5 text (engine-portable; at equal cost xxhash64
  * would be Spark-only and oracle-invisible).
  */
object Spans {

  /** Positional word k-grams: one row per (id, pos, gram_h) with
    * gram_h = md5 of the space-joined k consecutive tokens starting at
    * 0-based token position `pos`. Docs shorter than k tokens emit
    * nothing.
    */
  private def positionalGrams(df: DataFrame, idCol: String, textCol: String,
                              k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), size(toks) - k),
          i => md5(concat_ws(" ", slice(toks, i + 1, lit(k)))))))
      .where(size(toks) >= k)
      .withColumnsRenamed(Map("pos" -> "gpos", "col" -> "gram_h"))
  }

  /** Per-document repeated-span statistics over `minDocs`-shared k-token
    * windows: (idCol, n_tokens, n_dup_tokens, dup_frac, n_spans) where
    * n_dup_tokens counts token positions covered by at least one shared
    * window and n_spans counts the MAXIMAL merged spans (adjacent/
    * overlapping windows collapse). Every input doc appears in the output
    * — zero-coverage docs report 0/0.0/0, null-text docs report null
    * n_tokens. dup_frac is a division of exact integers (bit-portable).
    */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, minDocs: Int = 2): DataFrame = {
    val covered = coveredPositions(df, idCol, textCol, k, minDocs)
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("cpos"))).as("cov"))
    df.select(col(idCol), size(split(col(textCol), " ")).as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_dup_tokens"),
        when(col("n_tokens").isNull, lit(null).cast("double"))
          .otherwise(coalesce(size(col("cov")), lit(0)).cast("double") /
            col("n_tokens")).as("dup_frac"),
        // islands over the sorted position array: a span starts wherever
        // the previous element is not the immediate predecessor — in-row,
        // no window function. `get` is 0-based and null-safe out of
        // bounds, so the i=0 head never errors (null =!= x-1 is null,
        // and null-or-true disjunction keeps the head span)
        coalesce(size(filter(col("cov"),
            (x, i) => i === lit(0) ||
              coalesce(get(col("cov"), i - 1) =!= x - 1, lit(true)))),
          lit(0)).cast("long").as("n_spans"))
  }

  /** Rewrite: drop every token covered by a shared k-window from every
    * document (template/syndicated regions are noise wherever they appear
    * — the C4 rule; for a keep-one-copy policy route the span pairs
    * through [[Components]] like the doc-level families). Returns all
    * input docs with (idCol, clean_text, n_tokens, n_removed); null text
    * stays null.
    */
  def stripRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, minDocs: Int = 2): DataFrame = {
    val covered = coveredPositions(df, idCol, textCol, k, minDocs)
      .groupBy(col(idCol))
      .agg(collect_set(col("cpos")).as("cov"))
    val toks = split(col(textCol), " ")
    df.select(col(idCol), col(textCol))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol),
        // kept iff not covered; array_contains(null, i) is null, so
        // uncovered docs (no cov row) keep every token
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ",
            filter(toks,
              (_, i) => !coalesce(array_contains(col("cov"), i), lit(false)))))
          .as("clean_text"),
        size(toks).as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"))
  }

  /** (id, cpos) rows: token positions covered by any k-window shared with
    * `minDocs`-1 other documents. The positional-gram subtree appears in
    * both the frequency aggregation and the join-back with identical
    * columns, so ReuseExchange shuffles the exploded corpus once.
    */
  private def coveredPositions(df: DataFrame, idCol: String, textCol: String,
                               k: Int, minDocs: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val grams = positionalGrams(df, idCol, textCol, k)
      .repartition(parts, col("gram_h"))
    // the aggregation must keep BOTH idCol and gpos in its input so the
    // subtree stays column-identical to the join side and ReuseExchange
    // fires (the Boilerplate lesson): countDistinct holds idCol, the
    // discarded min(gpos) holds gpos — without it column pruning narrows
    // this side and the shared exchange splits into two corpus scans
    val shared = grams.groupBy(col("gram_h"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        min(col("gpos")).as("__graft_min_gpos"))
      // the min-gpos conjunct is vacuously true (positions are >= 0) but
      // the optimizer cannot prove it, so the aggregate survives pruning
      .where(col("n_docs") >= minDocs && col("__graft_min_gpos") >= 0)
      .select(col("gram_h"), lit(1).as("__graft_is_shared"))
    // left-outer + filter, NOT left_semi: PushDownLeftSemiAntiJoin would
    // push a semi join below the shared exchange and split it back into
    // two corpus scans (found the same way Boilerplate did)
    grams.join(shared, Seq("gram_h"), "left")
      .where(col("__graft_is_shared").isNotNull)
      .select(col(idCol),
        explode(sequence(col("gpos"), col("gpos") + (k - 1))).as("cpos"))
      .distinct()
  }
}
