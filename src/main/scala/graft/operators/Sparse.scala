package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned-sparse (SPLADE-family) retrieval — weighted sparse dot product
  * over a (id, term, weight) relation.
  *
  * BM25 (`Bm25.scala`) hard-codes one weighting; learned sparse models
  * (SPLADE, uniCOIL, DeepImpact) emit ARBITRARY per-(doc, term) weights and
  * score q·d = Σ_t w_q(t)·w_d(t). The engine part is weight-agnostic: store
  * the sparse vectors as a postings relation, prune the scan to the query's
  * terms, multiply map-side, sum per doc. [[tfVectors]] is the degenerate
  * built-in weighting (integer term frequency — also what makes the oracle
  * integer-exact); a trained model plugs in by providing its own
  * (id, term, weight) frame to the same [[topKSparse]].
  *
  * Scale shape: persist the sparse vectors `partitionBy("term")` (exactly
  * like [[Bm25.buildPostings]]) and the query-term `isin` filter becomes
  * partition pruning — a request reads only its terms' directories. The
  * per-request work is then |postings(query terms)| map-side multiplies and
  * ONE groupBy(id) sum with map-side partials; k bounds the final sort.
  * Integer weights make the score exact (no float-fold pinning needed);
  * double weights would ride the same plan with a sort_array-pinned fold.
  */
object Sparse {

  /** Sparse TF vectors from text: one (id, term, w) row per distinct term
    * per doc, w = term frequency. Same tokenizer as the BM25 index
    * (split on single space), so the two indexes agree on vocabulary.
    */
  def tfVectors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("w"))

  /** Driver-side twin of [[tfVectors]]' tokenization — THE one copy every
    * in-memory caller (delta-tier adds, specs, query registrations) must
    * share: Spark's `split(col, " ")` keeps empty tokens, so the twin is
    * `split(" ", -1)`, and w = term frequency. Document length for the
    * BM25 tier is the total token count = the weights' sum.
    */
  private[graft] def tfWeights(text: String): Map[String, Long] =
    text.split(" ", -1).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }

  /** Top-k by sparse dot product for one query (term → integer weight).
    * Ties break to lower id. Output: (idCol, score: long).
    */
  def topKSparse(sparseDocs: DataFrame, idCol: String,
                 query: Map[String, Long], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = sparseDocs.sparkSession
    if (query.isEmpty)
      return sparseDocs.select(col(idCol), lit(0L).as("score")).where(lit(false))
    val terms = query.keys.toSeq.sorted
    // bounded literal lookup — map-side, no join, no broadcast wait
    val qw: Column = element_at(typedlit(query), col("term"))
    sparseDocs.where(col("term").isin(terms: _*))
      .withColumn("__p", col("w") * qw)
      .groupBy(col(idCol))
      .agg(sum(col("__p")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
