package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): greedy
  * diversified rerank of a retrieval candidate pool —
  *   next = argmax_d  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
  * with ties to the lower id. The first pick (S empty) is pure relevance.
  *
  * Serving-path placement: MMR is inherently sequential (each pick changes
  * the next argmax), so it runs on the DRIVER over a candidate pool that
  * is a top-k list — k·dim floats, bounded by construction and independent
  * of corpus size, exactly like the stored query vectors every search
  * already collects. The distributed work (scoring the corpus, top-k) has
  * already happened upstream; at 100 TB the pool is still k rows.
  *
  * Float contract: sim must be BIT-identical to the engine's codegen
  * [[graft.functions.CosineSimilarity]] — [[cosD]] replicates its fold
  * (index-order accumulation of dot/na/nb, then dot/(√na·√nb)) so a rerank
  * of distributed scores cannot disagree with the expression that produced
  * them, and the DuckDB oracle's unrolled greedy lands on the same bits.
  */
object Mmr {

  /** Mirrors functions/VectorFunctions.scala CosineSimilarity exactly. */
  private[operators] def cosD(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
    require(a.length == b.length, s"dim mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy-select `k` of the candidates. `cands` must expose
    * (idCol: long, vecCol: array<float>, scoreCol: double = cosine to the
    * query). Returns (sel_rank, idCol, mmr): mmr is the criterion value at
    * selection time (= λ·score for the first pick).
    */
  def rerank(cands: DataFrame, idCol: String, vecCol: String,
             scoreCol: String, k: Int, lambda: Double): DataFrame = {
    val spark = cands.sparkSession
    val pool = cands.select(idCol, vecCol, scoreCol).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toIndexedSeq, r.getDouble(2))
    }
    val lc = 1.0 - lambda
    var remaining = pool
      .map { case (id, v, s) => (id, v, lambda * s) }
      .sortBy(_._1).toVector
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Float]]
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, rel) =>
        val m =
          if (selVecs.isEmpty) rel
          else rel - lc * selVecs.iterator.map(sv => cosD(v, sv)).max
        (id, v, rel, m)
      }
      // argmax mmr, ties to lower id: remaining is id-sorted and maxBy
      // keeps the FIRST strictly-greatest element, so the lowest id wins
      val best = scored.maxBy { case (_, _, _, m) => m }
      out += Row(rank, best._1, best._4)
      selVecs += best._2
      remaining = remaining.filterNot(_._1 == best._1)
      rank += 1
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("sel_rank", IntegerType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
