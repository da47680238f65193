package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
