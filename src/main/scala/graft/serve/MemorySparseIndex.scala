package graft.serve

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Memory tier for learned-sparse retrieval ([[graft.operators.Sparse]]):
  * term → id-ascending (id, weight) postings, scored with the same integer
  * dot product as the DataFrame path — Σ_t w_q(t)·w_d(t) — so results are
  * exactly equal (integer arithmetic, no fold-order question at all).
  * Ties break to lower id, like every serving tier here.
  */
final class MemorySparseIndex private (
    postings: Map[String, Array[(Long, Long)]]) { // term -> (id, w)

  def vocabularySize: Int = postings.size

  /** Top-k by sparse dot product; terms absent from the vocabulary
    * contribute nothing (an all-unknown query returns empty, the
    * serving convention).
    */
  def topK(query: Map[String, Long], k: Int): Seq[(Long, Long)] = {
    if (k <= 0) return Nil
    val present = query.keys.toSeq.filter(postings.contains).sorted
    if (present.isEmpty) return Nil
    val acc = new java.util.HashMap[Long, Long]()
    present.foreach { term =>
      val qw = query(term)
      postings(term).foreach { case (id, w) =>
        acc.put(id, acc.getOrDefault(id, 0L) + w * qw): Unit
      }
    }
    acc.entrySet().asScala.toSeq
      .map(e => (e.getKey.toLong, e.getValue.toLong))
      .sortBy { case (id, s) => (-s, id) }.take(k)
  }
}

object MemorySparseIndex {

  /** Load from a sparse-vector relation (id, term, w) — the same frame
    * [[graft.operators.Sparse.topKSparse]] scans (persisted
    * `partitionBy("term")` at scale; a serving node loads it in one read).
    */
  def fromDataFrame(sparseDocs: DataFrame, idCol: String): MemorySparseIndex = {
    val rows = sparseDocs
      .select(col("term"), col(idCol).cast("long"), col("w").cast("long"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    val byTerm = rows.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sortBy(_._1)
    }
    new MemorySparseIndex(byTerm)
  }
}
