package graft.serve

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Memory tier for RESIDUAL IVF-PQ ([[Ann.topKIvfResidualPq]]) — the
  * FAISS `IndexIVFPQ` serving layout: codes are stored PER CELL (the
  * inverted lists), and a request builds one ADC table per probed cell
  * from the QUERY'S residual against that cell. Per-request work =
  * nProbe × (table build: m·ksub·subdim mul-adds) + Σ probed-list codes ×
  * m byte lookups + exact rerank of the bounded candidate set — the
  * byte-coded resident set is 4·dim/m× smaller than the floats, which
  * stay resident only for the rerank (drop them for a codes-only replica
  * at the cost of exact ordering, as with [[MemoryPqIndex]]).
  * Results ≡ the DataFrame path bit-for-bit (ServeSpec).
  */
final class MemoryRpqIndex private (
    val dim: Int, m: Int,
    cells: Map[Int, (Array[Long], Array[Byte], Array[Float])], // id-ascending per cell
    centroids: Seq[Seq[Float]],
    codebooks: Seq[Seq[Seq[Float]]]) {

  def size: Int = cells.valuesIterator.map(_._1.length).sum

  /** ADC prune over the probed cells' lists + exact cosine rerank — the
    * [[Ann.topKIvfResidualPq]] contract (one candidate pool ACROSS the
    * probed cells, cut by (adc ASC, id ASC), rerank by (score DESC, id)).
    */
  def topK(query: Seq[Float], k: Int, nProbe: Int,
           rerankFactor: Int = 4): Seq[(Long, Double)] = {
    require(query.length == dim, s"query dim ${query.length} != index dim $dim")
    if (k <= 0) return Nil
    require(rerankFactor >= 1, s"rerankFactor must be >= 1, got $rerankFactor")
    val probed = Ann.probeCellsFor(centroids, query, nProbe)
      .filter(cells.contains)
    if (probed.isEmpty) return Nil
    val kk = math.max(k, rerankFactor * k)
    // candidates as (adc, id, cell, row) — bounded heap, worst at head
    final case class Cand(adc: Double, id: Long, cell: Int, row: Int)
    val heap = new java.util.PriorityQueue[Cand](
      kk,
      (a: Cand, b: Cand) => {
        val c = java.lang.Double.compare(b.adc, a.adc)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      })
    probed.foreach { cell =>
      val (ids, codes, _) = cells(cell)
      val table = Ann.adcTableFor(codebooks,
        Ann.residualOf(query, centroids(cell))).map(_.toArray).toArray
      var r = 0
      while (r < ids.length) {
        // the engine's fold: seed 0.0, subspace-ascending adds
        var s = 0.0
        var j = 0
        while (j < m) { s += table(j)(codes(r * m + j) & 0xff); j += 1 }
        if (heap.size < kk) heap.add(Cand(s, ids(r), cell, r)): Unit
        else {
          val w = heap.peek()
          val c = java.lang.Double.compare(s, w.adc)
          if (c < 0 || (c == 0 && ids(r) < w.id)) {
            heap.poll(); heap.add(Cand(s, ids(r), cell, r)): Unit
          }
        }
        r += 1
      }
    }
    heap.asScala.toSeq.map { cand =>
      val vecs = cells(cand.cell)._3
      val base = cand.row * dim
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        val x = vecs(base + i).toDouble; val y = query(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      (cand.id, dot / (math.sqrt(na) * math.sqrt(nb)))
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }
}

object MemoryRpqIndex {

  /** Load from a residual-coded frame ([[Ann.withResiduals]] +
    * [[Ann.withPqCodes]]) plus the IVF centroids and residual codebooks —
    * the same inputs the DataFrame path scans.
    */
  def fromDataFrame(coded: DataFrame, idCol: String, embCol: String,
                    assignCol: String, codeCol: String,
                    centroids: Seq[Seq[Float]],
                    codebooks: Seq[Seq[Seq[Float]]]): MemoryRpqIndex = {
    val m = codebooks.length
    require(codebooks.forall(_.length <= 256),
      "byte-packed PQ needs ksub <= 256")
    val rows = coded
      .where(col(embCol).isNotNull && col(codeCol).isNotNull)
      .select(col(idCol).cast("long"), col(embCol),
        col(assignCol).cast("int"), col(codeCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2), r.getSeq[Int](3)))
    require(rows.nonEmpty, "MemoryRpqIndex: empty corpus")
    val dim = rows.head._2.length
    require(dim == codebooks.head.head.size * m,
      s"dim $dim != m($m) x subdim(${codebooks.head.head.size})")
    val byCell = rows.groupBy(_._3).map { case (cell, rs) =>
      val sorted = rs.sortBy(_._1)
      val ids = sorted.map(_._1).toArray
      val vecs = new Array[Float](sorted.length * dim)
      val codes = new Array[Byte](sorted.length * m)
      sorted.zipWithIndex.foreach { case ((_, v, _, c), r) =>
        v.copyToArray(vecs, r * dim)
        c.zipWithIndex.foreach { case (cv, j) => codes(r * m + j) = cv.toByte }
      }
      cell -> (ids, codes, vecs)
    }
    new MemoryRpqIndex(dim, m, byCell, centroids, codebooks)
  }
}
