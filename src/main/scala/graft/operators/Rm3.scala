package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-relevance-feedback query expansion (the RM3 recipe, Lavrenko &
  * Croft 2001 / Abdul-Jaleel et al. 2004, in its deterministic tf-weighted
  * form): run the query once, assume the top `fbK` documents are relevant,
  * mine their most frequent non-query terms, and re-run with the enlarged
  * weighted query. Recall insurance for short queries — the second pass
  * reaches documents that share the topic's vocabulary but none of the
  * original terms.
  *
  * Determinism: expansion terms rank by (summed tf DESC, term ASC) — an
  * integer sort both engines replay exactly — and the second pass is
  * [[Sparse.topKSparse]]'s integer dot product, so the whole two-round
  * pipeline is oracle-exact. (Canonical RM3 interpolates unigram-model
  * PROBABILITIES; the engine shape — bounded feedback set, term mining,
  * weighted re-query — is identical, and a probability weighting plugs into
  * the same `Map[String, Long]`-shaped query by scaling to integers.)
  *
  * Scale shape: round 1 is the BM25 scan (or a postings read); the feedback
  * set is fbK ids (bounded, collected — it parameterizes the next plan);
  * term mining explodes ONLY the fbK feedback docs (an `isin` semi-join
  * prunes the scan); round 2 is one more pruned postings pass. No stage
  * shuffles more than (doc, term) pairs of the terms involved.
  */
object Rm3 {

  /** Mine the expanded weighted query: original terms keep weight `origW`,
    * the top `m` feedback terms (by summed tf across the `fbK` first-pass
    * documents, original terms excluded, ties alphabetical) join with
    * weight `expW`.
    */
  def expandedQuery(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], fbK: Int, m: Int,
                    origW: Long = 2L, expW: Long = 1L): Map[String, Long] = {
    require(fbK >= 1 && m >= 0, s"need fbK >= 1 and m >= 0, got fbK=$fbK m=$m")
    val fbIds = Bm25.search(docs, idCol, textCol, terms, fbK)
      .select(idCol).collect().map(_.getLong(0)).toSeq
    val expansion = docs.where(col(idCol).isin(fbIds: _*))
      .select(explode(split(col(textCol), " ")).as("term"))
      .where(!col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(m)
      .select("term").collect().map(_.getString(0)).toSeq
    (terms.map(_ -> origW) ++ expansion.map(_ -> expW)).toMap
  }

  /** The full two-round pipeline: expand, then score the corpus's sparse
    * TF vectors with the expanded weighted query. Output: (idCol, score).
    */
  def searchExpanded(docs: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String], k: Int, fbK: Int = 3, m: Int = 2,
                     origW: Long = 2L, expW: Long = 1L): DataFrame = {
    val q = expandedQuery(docs, idCol, textCol, terms, fbK, m, origW, expW)
    Sparse.topKSparse(Sparse.tfVectors(docs, idCol, textCol), idCol, q, k)
  }
}
