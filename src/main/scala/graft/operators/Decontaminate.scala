package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination: drop (or flag) corpus documents that share any
  * word n-gram with a benchmark/eval set — the standard n-gram-overlap
  * decontamination step a pretraining pipeline runs before training, so eval
  * scores measure generalization instead of memorization.
  *
  * Scale shape (the reason this is NOT a generic join): the benchmark side
  * is small by construction — eval suites are thousands of documents, not
  * billions — so its distinct n-gram set is hashed to longs and BROADCAST.
  * The 100 TB corpus side explodes to (doc, gram-hash) rows and the
  * semi-join runs map-side inside the scan stage: the corpus is never
  * shuffled. The only shuffle is the distinct over contaminated doc ids,
  * bounded by the (tiny) hit count. xxhash64-hashing the grams makes the
  * broadcast 8 bytes/gram instead of ~8·wordLen and keeps membership
  * semantics modulo 2^-64 collisions (same contract as
  * [[Dedup.jaccardPairsBlocked]]'s hashed intersections).
  */
object Decontaminate {

  /** Distinct ids of corpus docs sharing >= 1 word n-gram with `bench`. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gram_h"))
      .distinct()
    corpus
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
      .join(broadcast(benchGrams), Seq("gram_h"), "left_semi")
      .select(idCol).distinct()
  }

  /** Corpus minus contaminated docs. The hit set is usually tiny (AQE
    * broadcasts it from its runtime size), but it is corpus-bounded, not
    * bench-bounded, so the broadcast is left to the planner rather than
    * forced.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** Bloom-routed variant of [[contaminatedIds]] — EXACTLY the same result,
    * built for the regime where the bench gram set is too big to broadcast
    * exactly. [[contaminatedIds]] ships every distinct bench gram hash to
    * every executor (8 bytes/gram: a 1B-gram eval corpus is an 8 GB
    * broadcast — dead on arrival); here the executors get a Bloom filter of
    * the set instead (~1 byte/gram at the default sizing), the corpus gram
    * stream is pre-filtered MAP-SIDE inside its scan stage by
    * `might_contain`, and only the surviving near-hits — true hits plus the
    * filter's bounded false-positive trickle — flow into an exact
    * shuffle semi-join against the full bench gram set. The shuffle is
    * near-hit-bounded, not corpus-bounded, and no exact broadcast of the
    * bench set ever happens, so the memory ceiling is the filter's bit
    * array. False positives cost only wasted verify rows; false negatives
    * are impossible, hence result equality with the exact operator.
    *
    * Spark-native plumbing: the filter is built by Catalyst's own
    * `BloomFilterAggregate` over `xxhash64(gram)` (one partial-merge
    * aggregation, the same machinery behind runtime row-level filtering)
    * and probed by the codegen `BloomFilterMightContain` against the
    * serialized sketch as a binary literal — no UDF in the hot path. The
    * driver holds one sketch of `numBits/8` bytes (a constant-size
    * collect, same contract as the centroid collects in [[Ann]]).
    *
    * `expectedItems` sizes the filter (capped at Spark's 4M-item /
    * 64Mbit aggregate defaults; ~8 bits/item ⇒ ~2% fpp at capacity —
    * overshoot only flattens the pre-filter, never breaks correctness).
    */
  def contaminatedIdsBloom(corpus: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String, n: Int = 8,
                           expectedItems: Long = 1L << 20): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    val benchGrams = bench
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gram_h"))
      .distinct()
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(col("gram_h")),
        expectedItems).toAggregateExpression())
    val sketch = benchGrams.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val corpusGrams = corpus
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    if (sketch == null) {
      // empty bench side: BloomFilterAggregate yields null — nothing can hit
      corpusGrams.select(idCol).limit(0)
    } else {
      val mightContain = ColumnBridge.column(BloomFilterMightContain(
        Literal(sketch, BinaryType), ColumnBridge.expression(col("gram_h"))))
      corpusGrams
        .where(mightContain) // map-side, inside the corpus scan stage
        .join(benchGrams, Seq("gram_h"), "left_semi") // exact verify, NOT broadcast
        .select(idCol).distinct()
    }
  }

  /** Corpus minus contaminated docs, bloom-routed ([[contaminatedIdsBloom]]
    * semantics — identical result to [[decontaminate]]).
    */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int = 8,
                         expectedItems: Long = 1L << 20): DataFrame =
    corpus.join(contaminatedIdsBloom(corpus, bench, idCol, textCol, n,
      expectedItems), Seq(idCol), "left_anti")

  /** Span-level contamination report: for every corpus document sharing at
    * least one word n-gram with `bench`, its MAXIMAL contaminated token
    * regions — one row per merged span, (idCol, span_start, span_end,
    * span_tokens), token positions 0-based inclusive. [[contaminatedIds]]
    * answers "which docs leak"; this answers "which REGIONS leak" — the
    * input a surgical span-removal policy needs (strip the quoted eval
    * question, keep the surrounding document) where a doc-level drop would
    * discard an entire book because one paragraph quotes a benchmark.
    *
    * Scale shape mirrors [[contaminatedIds]]: the bench gram-hash set
    * broadcasts; the corpus explodes to POSITIONAL (id, gpos, hash) rows
    * semi-joined map-side inside their scan stage; the only shuffle is the
    * per-doc rollup of covered positions — bounded by the HIT token count
    * (contamination is rare by construction), never the corpus, with
    * collect_set deduplicating overlapping-window positions in the partial
    * (map-side) aggregation. The span merge is [[Spans]]' in-row island
    * trick on the sorted position set — starts where no predecessor, ends
    * where no successor, zip — so no window function ever sorts a
    * document's positions in a dedicated task.
    *
    * Null-text corpus docs emit no grams (no spans). Docs shorter than n
    * tokens emit their single clamped gram at position 0
    * ([[Dedup.wordNgrams]] semantics) with coverage clamped to the last
    * real token.
    */
  def contaminationSpans(corpus: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gram_h"))
      .distinct()
    val toks = split(col(textCol), " ")
    val hits = corpus
      .where(col(textCol).isNotNull)
      .select(col(idCol), size(toks).as("__graft_n_toks"),
        posexplode(transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n)))))))
      .withColumnsRenamed(Map("pos" -> "__graft_gpos", "col" -> "gram_h"))
      .join(broadcast(benchGrams), Seq("gram_h"), "left_semi")
    // the least() clamp keeps short-doc coverage inside the doc (and, with
    // the isNotNull guard above, the sequence bounds always ascend — no
    // descending-sequence surprise)
    val cov = hits
      .select(col(idCol), explode(sequence(col("__graft_gpos"),
        least(col("__graft_gpos") + (n - 1),
          col("__graft_n_toks") - 1))).as("cpos"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("cpos"))).as("cov"))
    val starts = filter(col("cov"), (x, i) => i === lit(0) ||
      coalesce(get(col("cov"), i - 1) =!= x - 1, lit(true)))
    val ends = filter(col("cov"), (x, i) =>
      coalesce(get(col("cov"), i + 1) =!= x + 1, lit(true)))
    cov.select(col(idCol),
        explode(arrays_zip(starts.as("s"), ends.as("e"))).as("sp"))
      .select(col(idCol),
        col("sp.s").as("span_start"), col("sp.e").as("span_end"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("span_tokens"))
  }

  /** SEMANTIC decontamination — the embedding-space form of the n-gram
    * detectors above: a corpus row is contaminated when its embedding's
    * max cosine against ANY benchmark vector reaches `tau` (catches
    * paraphrases and reformatted leaks that exact-gram matching misses;
    * the n-gram forms catch verbatim leaks the embedder might smooth
    * over — production pipelines run both). The benchmark set is small
    * by definition (an eval suite), so it rides into the scan as
    * LITERAL columns: one codegen [[graft.functions.CosineSimilarity]]
    * per benchmark vector, `greatest(...)` folds the max (order-free
    * exact IEEE) — a pure map-side projection, ZERO shuffle, no join,
    * nothing broadcast at all. The 100 TB cost is exactly one pass over
    * the corpus embeddings.
    */
  def byEmbedding(corpus: DataFrame, idCol: String, vecCol: String,
                  benchmark: Seq[Seq[Float]], tau: Double): DataFrame = {
    require(benchmark.nonEmpty, "byEmbedding: empty benchmark set")
    val cosines = benchmark.map(b =>
      graft.functions.VectorFunctions.cosineSim(col(vecCol), typedlit(b)))
    val maxSim =
      if (cosines.length == 1) cosines.head else greatest(cosines: _*)
    corpus.select(col(idCol), maxSim.as("max_sim"))
      .withColumn("contaminated", col("max_sim") >= lit(tau))
  }
}
