package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

import graft.operators.{Ann, Bm25}
import graft.plans.AnnIndexMeta

/** Memory-resident ANN serving index — the "specialized online runtime"
  * the reference's own notes call for at serving scale
  * (`/root/reference/README.md:19-21`: ~1,000 QPS at ~300 ms p50 over a
  * ~10K-doc corpus). Spark is the right engine for BUILDING the index
  * (embed, assign, compress, persist) and for batch search, but a
  * per-request Spark job pays full scheduling (~tens of ms floor and a
  * driver-side ceiling of ~300 QPS measured at 32 streams) — two orders
  * of magnitude of unnecessary machinery when the probed working set is
  * megabytes. This class is the serving tier: it loads the SAME persisted
  * artifacts the Spark path scans (the `partitionBy(ivf_cell)` parquet +
  * [[AnnIndexMeta]] sidecar written by the index build) into flat primitive
  * arrays and answers top-k with zero job launches.
  *
  * Result contract: BIT-IDENTICAL to the DataFrame path. Scoring uses the
  * same sequential double fold as the codegen [[graft.functions.CosineSimilarity]]
  * (via [[Ann.cosine]]), cell probing uses [[Ann.topKIvf]]'s exact rule
  * (cosine to centroids, ties to the lower cell id), and ranking ties
  * break by ascending id — so `topK`/`topKIvf` return exactly the rows
  * `Ann.topK`/`Ann.topKIvf` would, in the same order, with the same score
  * bits (ServeSpec pins this).
  *
  * Scale posture: memory is nDocs × dim × 4 bytes (+16/doc) — the
  * reference's 10 K-doc envelope is ~3 MB at dim 768; 10 M docs at dim
  * 768 is ~30 GB, which is where a deployment shards CELLS across serving
  * replicas (each node loads a cell subset; the probe fans out to the
  * owners and merges k-bounded lists — the same merge [[Ann.TopKBuf]]
  * does inside Spark). The batch/build tier stays Spark; this tier is
  * rebuilt/swapped per index publish (cheap: one sequential parquet read).
  *
  * Thread-safety: immutable after construction — serve from any number of
  * request threads.
  */
final class MemoryAnnIndex private (
    val dim: Int,
    cellOffsets: Array[Int], // length nCells+1; row range of cell c
    ids: Array[Long], // grouped by cell, ascending id within cell
    vecs: Array[Float], // flattened dim-strided, parallel to ids
    val centroids: IndexedSeq[IndexedSeq[Float]]) {

  def nCells: Int = cellOffsets.length - 1
  def size: Int = ids.length

  /** The probe rule shared with [[Ann.topKIvf]]: cells ranked by
    * (cosine to centroid DESC, cell id ASC), top `nProbe`.
    */
  def probeCells(query: Seq[Float], nProbe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (Ann.cosine(query, c), i) }
      .sortBy(x => (-x._1, x._2)).take(nProbe).map(_._2)

  /** Exact top-k: scan every cell (the reference's ~10K-doc design point,
    * where brute force IS the plan). Ties break by ascending id.
    */
  def topK(query: Seq[Float], k: Int): Seq[(Long, Double)] =
    topKInCells(query, k, 0 until nCells)

  /** IVF-probed top-k: scan only the `nProbe` query-nearest cells. */
  def topKIvf(query: Seq[Float], k: Int, nProbe: Int): Seq[(Long, Double)] =
    topKInCells(query, k, probeCells(query, nProbe))

  private def topKInCells(query: Seq[Float], k: Int,
                          cells: Seq[Int]): Seq[(Long, Double)] = {
    require(query.length == dim, s"query dim ${query.length} != index dim $dim")
    val q = query.toArray
    // bounded selection: a k-element min-heap ordered worst-first
    // ((score ASC, id DESC) so the head is the current loser)
    val heap = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })
    cells.foreach { cell =>
      var r = cellOffsets(cell)
      val end = cellOffsets(cell + 1)
      while (r < end) {
        // same fold as the codegen CosineSimilarity: in-order double
        // accumulation of dot/na/nb, one expression shape
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val base = r * dim
        while (i < dim) {
          val x = vecs(base + i).toDouble; val y = q(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val score = dot / (math.sqrt(na) * math.sqrt(nb))
        val cand = (score, ids(r))
        if (heap.size < k) heap.add(cand)
        else {
          val worst = heap.peek()
          val c = java.lang.Double.compare(score, worst._1)
          if (c > 0 || (c == 0 && cand._2 < worst._2)) {
            heap.poll(); heap.add(cand): Unit
          }
        }
        r += 1
      }
    }
    heap.asScala.toSeq.sortBy { case (s, id) => (-s, id) }
      .map { case (s, id) => (id, s) }
  }
}

object MemoryAnnIndex {

  /** Load from collected (id, embedding, cell) rows + centroids. */
  def fromRows(rows: Seq[(Long, Seq[Float], Int)],
               centroids: Seq[Seq[Float]]): MemoryAnnIndex = {
    require(rows.nonEmpty, "MemoryAnnIndex: empty corpus")
    val dim = rows.head._2.length
    require(rows.forall(_._2.length == dim), "MemoryAnnIndex: ragged dims")
    val nCells = centroids.length
    val sorted = rows.sortBy(r => (r._3, r._1)).toArray
    val offsets = new Array[Int](nCells + 1)
    sorted.foreach { case (_, _, c) =>
      require(c >= 0 && c < nCells, s"cell $c out of range [0, $nCells)")
      offsets(c + 1) += 1
    }
    var i = 0
    while (i < nCells) { offsets(i + 1) += offsets(i); i += 1 }
    val ids = new Array[Long](sorted.length)
    val vecs = new Array[Float](sorted.length * dim)
    var r = 0
    while (r < sorted.length) {
      ids(r) = sorted(r)._1
      val v = sorted(r)._2
      var j = 0
      while (j < dim) { vecs(r * dim + j) = v(j); j += 1 }
      r += 1
    }
    new MemoryAnnIndex(dim, offsets, ids, vecs,
      centroids.map(_.toIndexedSeq).toIndexedSeq)
  }

  /** Load from an assigned-corpus DataFrame (e.g. the reloaded
    * `partitionBy(cellCol)` parquet) + explicit centroids.
    */
  def fromDataFrame(df: DataFrame, idCol: String, embCol: String,
                    cellCol: String, centroids: Seq[Seq[Float]]): MemoryAnnIndex =
    fromRows(
      df.select(col(idCol).cast("long"), col(embCol),
          col(cellCol).cast("int"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq,
      centroids)

  /** Load a SELF-DESCRIBING persisted index: the `partitionBy` parquet
    * directory with its [[AnnIndexMeta]] sidecar (the exact artifact
    * `AnnIndexMeta.buildIvfIndex` / the q144 layout writes). One
    * sequential scan at startup; Spark is not touched again afterwards.
    */
  def load(spark: SparkSession, indexDir: String,
           idCol: String): MemoryAnnIndex = {
    val meta = AnnIndexMeta.read(spark.sessionState.newHadoopConf(),
        new org.apache.hadoop.fs.Path(indexDir))
      .getOrElse(sys.error(s"no ${AnnIndexMeta.FileName} sidecar at $indexDir"))
    fromDataFrame(spark.read.parquet(indexDir), idCol, meta.embCol,
      meta.assignCol, meta.centroids)
  }
}

/** Memory-resident BM25 postings — the lexical leg of the serving tier.
  * Loads the term-partitioned postings artifact ([[Bm25.buildPostings]])
  * plus the build-time index metadata (idf per term, avgdl) and answers
  * keyword top-k without a job. Scores are BIT-IDENTICAL to
  * [[Bm25.searchPostings]]: the same contribution expression shape and the
  * same per-doc fold order (terms ascending — the DataFrame path's
  * `sort_array(struct(term, c))`). Memory is O(Σ postings); a deployment
  * past memory shards by TERM (each replica owns a term range — queries
  * fan out and per-doc partials merge by sum, which is safe because the
  * fold re-sorts per doc).
  */
final class MemoryPostingsIndex private (
    postings: Map[String, Array[(Long, Long, Long)]], // term -> (id, tf, dl), id-ascending
    idf: Map[String, Double], avgdl: Double,
    k1: Double, b: Double) {

  def vocabularySize: Int = postings.size

  /** BM25 top-k for `terms`; unknown-terms-only queries return empty
    * (the [[Bm25.searchPostings]] contract).
    */
  def search(terms: Seq[String], k: Int): Seq[(Long, Double)] = {
    val present = terms.distinct.filter(t => idf.contains(t) && postings.contains(t))
    if (present.isEmpty) return Nil
    val acc = new java.util.HashMap[Long, Double]()
    // term-ascending order = the DataFrame path's per-doc
    // sort_array(struct(term, c)) fold (each term appears once per doc)
    present.sorted.foreach { term =>
      val w = idf(term)
      postings(term).foreach { case (id, tf, dl) =>
        val tfD = tf.toDouble
        val c = w * ((tfD * (k1 + 1.0)) /
          (tfD + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl))))
        acc.put(id, acc.getOrDefault(id, 0.0) + c): Unit
      }
    }
    acc.entrySet().asScala.toSeq
      .map(e => (e.getKey.toLong, e.getValue.toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(k)
  }
}

object MemoryPostingsIndex {

  /** Load from the postings artifact + precomputed metadata (the same
    * inputs [[Bm25.searchPostings]] takes).
    */
  def fromDataFrame(postings: DataFrame, idCol: String,
                    idf: Map[String, Double], avgdl: Double,
                    k1: Double = 1.2, b: Double = 0.75): MemoryPostingsIndex = {
    val rows = postings
      .select(col("term"), col(idCol).cast("long"), col("tf").cast("long"),
        col("dl").cast("long"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val byTerm = rows.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sortBy(_._1)
    }
    new MemoryPostingsIndex(byTerm, idf, avgdl, k1, b)
  }
}

/** The serving front door over the memory tier: dense, lexical, and
  * hybrid (RRF-fused) search plus the Method-1 JSON request shape for the
  * pre-embedded `query_vector` path
  * (`/root/reference/01_method1_cortex_search.sql:200-219` — text
  * `query` requests embed on the caller's side or stay on the
  * [[graft.api.SemanticSearch]] DataFrame tier, where the embedder and
  * the filter DSL live). Hybrid fuses the two k-bounded legs with
  * [[Bm25.rrfFuseLocal]] — the identical fusion the Spark path uses, so
  * hybrid results also match bit-for-bit.
  */
final class MemoryServer(dense: MemoryAnnIndex,
                         lexical: Option[MemoryPostingsIndex],
                         defaultNProbe: Int = 0) {

  private val mapper = new ObjectMapper()

  /** Dense top-k: IVF-probed when the server was built with a probe
    * width, exact otherwise.
    */
  def topKVec(qvec: Seq[Float], k: Int): Seq[(Long, Double)] =
    if (defaultNProbe > 0) dense.topKIvf(qvec, k, defaultNProbe)
    else dense.topK(qvec, k)

  def searchLexical(terms: Seq[String], k: Int): Seq[(Long, Double)] =
    lexical.getOrElse(sys.error("MemoryServer built without a postings index"))
      .search(terms, k)

  /** Hybrid: dense + lexical candidate lists (each `poolK` deep), fused
    * by reciprocal rank. Rank = 1-based position in each leg.
    */
  def searchHybrid(qvec: Seq[Float], terms: Seq[String], k: Int,
                   poolK: Int = 20, c: Int = 60): Seq[(Long, Double)] = {
    val d = topKVec(qvec, poolK).zipWithIndex
      .map { case ((id, _), i) => (id, i + 1) }
    val l = searchLexical(terms, poolK).zipWithIndex
      .map { case ((id, _), i) => (id, i + 1) }
    Bm25.rrfFuseLocal(Seq(d, l), c, k)
  }

  /** JSON request → JSON response, job-free. Accepts `query_vector` +
    * `limit` (the deterministic serving path); a `query` text request
    * needs the embedder and belongs to the DataFrame tier.
    */
  def search(requestJson: String): String = {
    val req = mapper.readTree(requestJson)
    val k = Option(req.get("limit")).map(_.asInt()).getOrElse(5)
    val vecNode = Option(req.get("query_vector")).filter(_.isArray).getOrElse(
      throw new IllegalArgumentException(
        "memory tier serves 'query_vector' requests; text 'query' goes " +
          "through the embedder-backed DataFrame tier"))
    val qv = vecNode.elements().asScala.map(_.floatValue()).toSeq
    val hits = topKVec(qv, k)
      .map { case (id, s) => s"""{"id":"$id","score":"$s"}""" }
    s"""{"results":[${hits.mkString(",")}]}"""
  }
}
