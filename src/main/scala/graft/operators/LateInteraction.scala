package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Late-interaction (multi-vector) retrieval — MaxSim scoring: a query
  * is a BAG of vectors (one per token/segment) and a document is too;
  * score(doc) = Σ over query vectors of the MAX cosine against any of
  * the doc's vectors (Khattab & Zaharia's ColBERT scoring rule, applied
  * here to any multi-vector column layout). Single-vector search
  * compresses a whole document into one point; late interaction keeps
  * per-part vectors and lets each query part pick its best match — the
  * retrieval-quality upgrade the reference's single-vector
  * `VECTOR_COSINE_SIMILARITY` path (02:212) cannot express.
  *
  * Plan shape (the 100 TB posture): the per-(row, queryVec) cosines are
  * codegen [[graft.functions.CosineSimilarity]] columns evaluated IN THE
  * SCAN (no explode, no join — the query bag is a handful of literals),
  * then ONE hash aggregate per doc computes the per-query-vector MAXes
  * (map-side partial max — order-free and exact in IEEE), and the final
  * score folds the maxes in query-vector order (the pinned left-assoc
  * sum, mirrored by the oracle's `list_sum(list(m ORDER BY qtok))`).
  * One shuffle total, O(docs) aggregate state, broadcast nothing.
  */
object LateInteraction {

  /** Top-k docs by MaxSim. `docs` has one row per (doc, part-vector);
    * `queryVecs` is the query bag (order defines the score fold).
    * Output: (docCol, score), (score DESC, doc ASC), k rows.
    */
  def maxSimTopK(docs: DataFrame, docCol: String, vecCol: String,
                 queryVecs: Seq[Seq[Float]], k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "maxSim: empty query bag")
    require(k > 0)
    val maxes: Seq[Column] = queryVecs.zipWithIndex.map { case (qv, i) =>
      max(VectorFunctions.cosineSim(col(vecCol), typedlit(qv))).as(s"__m$i")
    }
    val score = queryVecs.indices
      .map(i => col(s"__m$i"))
      .reduceLeft(_ + _) // left-assoc, query-vector-ascending — the oracle's fold
    docs.groupBy(col(docCol))
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("score", score)
      .orderBy(col("score").desc, col(docCol))
      .limit(k)
      .select(col(docCol), col("score"))
  }
}
