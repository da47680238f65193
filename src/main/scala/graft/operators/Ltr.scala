package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSim

/** Learning-to-rank training-set construction — the composition a
  * ranking pipeline runs nightly: candidate generation (lexical ∪ dense
  * pool), per-candidate feature extraction, and weak relevance labels
  * distilled from the exact dense top-k. One row per (query, candidate)
  * with the standard first-stage features; the output trains the
  * reranker that [[Mmr]]/fusion then serve.
  *
  * Every feature is an already-gated fragment: BM25 via [[Bm25.scoreAll]]
  * (order-pinned fold, 0.0 for candidates the query's terms never touch
  * — absence is a feature, not a null), cosine via the codegen
  * expression, dl/n_chars integer. Labels: membership in the exact
  * dense top-`labelK` (the distillation/weak-supervision labeling move;
  * swap in click data at production).
  *
  * Scale shape: candidates are bounded by |BM25-matched| + `densePool`
  * per query (query-pruned postings + TakeOrderedAndProject — nothing
  * corpus-sized shuffles); features attach through hash joins on the
  * candidate set; per-query frames union. A many-thousand-query refresh
  * would swap the per-query dense scans for [[Ann.topKBatch]] and the
  * BM25 legs for one postings pass over the union of query terms — same
  * features, same labels.
  */
object Ltr {

  /** @param queries (qid, terms, queryVector, selfId) — `selfId` is the
    *   query's own row id, excluded from candidates (a query trivially
    *   retrieves itself; a training row for it is leakage).
    */
  def featureTable(docs: DataFrame, emb: DataFrame,
                   docId: String, embId: String,
                   queries: Seq[(Long, Seq[String], Seq[Float], Long)],
                   labelK: Int = 10, densePool: Int = 20,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "featureTable needs at least one query")
    require(labelK <= densePool,
      s"labelK ($labelK) must be within the dense pool ($densePool)")
    val perQ = queries.map { case (qid, terms, qvec, selfId) =>
      val corpus = emb.where(col(embId) =!= selfId)
      val lex = Bm25.scoreAll(docs, docId, "text", terms, k1, b)
        .select(col(docId).as("id"), col("score").as("bm25"))
      val pool = Ann.topK(corpus, embId, "embedding", qvec, densePool)
        .select(col(embId).as("id"))
      val lab = Ann.topK(corpus, embId, "embedding", qvec, labelK)
        .select(col(embId).as("id")).withColumn("__lab", lit(1))
      lex.select("id").unionByName(pool).distinct()
        .where(col("id") =!= selfId)
        .join(lex, Seq("id"), "left")
        .join(emb.select(col(embId).as("id"), col("embedding")), Seq("id"))
        .withColumn("cos", cosineSim(col("embedding"), typedlit(qvec)))
        .join(docs.select(col(docId).as("id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("dl")), Seq("id"))
        .join(lab, Seq("id"), "left")
        .select(lit(qid).as("qid"), col("id").as("doc_id"),
          coalesce(col("bm25"), lit(0.0)).as("bm25"),
          col("cos"), col("dl"), col("n_chars"),
          coalesce(col("__lab"), lit(0)).as("label"))
    }
    perQ.reduce(_ unionByName _)
  }
}
