package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[topK]]: exact brute-force cosine top-k. Catalyst plans
  *    `TakeOrderedAndProject` — per-partition bounded heaps, driver merge of
  *    k rows per partition; no global sort, no shuffle. This is the
  *    reference's own search semantics (exact scored top-k,
  *    `/root/reference/02_method2_manual_vector_embedding.sql:226-227`) and
  *    stays viable per-partition-parallel at any corpus size.
  *  - [[topKBatch]]: many queries in one job via a partial-aggregating
  *    bounded-heap UDAF — map-side combine keeps the shuffle at k rows per
  *    (query, partition), not |corpus| rows.
  *  - [[withHyperplaneBuckets]] / [[withIvfAssignment]]: the >=1M-vector scale
  *    path — restrict scoring to one bucket / nProbe nearest centroids.
  */
object Ann {

  /** Exact brute-force top-k for a single query vector. */
  def topK(corpus: DataFrame, idCol: String, embCol: String,
           query: Seq[Float], k: Int, filter: Column = lit(true)): DataFrame =
    corpus.where(filter && col(embCol).isNotNull)
      .withColumn("score", cosineSim(col(embCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Exact max-inner-product top-k (the un-normalized metric —
    * recommendation scores, learned rankers whose magnitude carries
    * signal). Same `TakeOrderedAndProject` shape as [[topK]], scored by
    * the codegen dot product (index-order double fold — the oracle's
    * `list_sum` over the zipped pair list).
    */
  def topKMips(corpus: DataFrame, idCol: String, embCol: String,
               query: Seq[Float], k: Int, filter: Column = lit(true)): DataFrame =
    corpus.where(filter && col(embCol).isNotNull)
      .withColumn("score", dotProduct(col(embCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** MIPS → cosine reduction (Bachrach et al., RecSys'14): append
    * sqrt(M² − ‖x‖²) to every vector, where M = the corpus max norm, and
    * 0 to the query ([[mipsQuery]]). Every augmented vector then has
    * norm exactly M, so cosine ORDER over the augmented space equals
    * inner-product order over the original — and MIPS can ride the
    * entire cosine index stack (IVF cells, HNSW, hyperplane buckets)
    * unchanged. Scores differ by the monotone dot/M transform; only the
    * ORDER transfers, which is what an index prune needs (exact rerank
    * re-scores with [[topKMips]]).
    *
    * M² is ONE driver-side scalar (a max aggregate); augmentation is
    * map-side. Float rounding note: ‖x‖² accumulates in double and the
    * appended element rounds to float once — with M² ≥ ‖x‖² by
    * construction the sqrt argument is clamped at ≥ 0.
    */
  def withMipsAugmentation(df: DataFrame, embCol: String,
                           augCol: String = "mips_aug"): DataFrame = {
    val sq = aggregate(col(embCol), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val m2 = df.where(col(embCol).isNotNull)
      .agg(max(sq)).head().getDouble(0)
    df.withColumn(augCol,
      concat(col(embCol),
        array(sqrt(greatest(lit(m2) - sq, lit(0.0))).cast("float"))))
  }

  /** The query-side half of [[withMipsAugmentation]]: same vector, one
    * trailing zero (contributes nothing to any augmented dot).
    */
  def mipsQuery(query: Seq[Float]): Seq[Float] = query :+ 0.0f

  /** Parent-document retrieval (the RAG two-granularity pattern): retrieve
    * at CHUNK granularity — small spans embed precisely — then return the
    * PARENT documents, each scored by its best chunk. Stage 1 is the exact
    * chunk top-`chunkPool` ([[topK]] — TakeOrderedAndProject, no shuffle);
    * stage 2 dedups parents over that BOUNDED pool (a window over ≤
    * chunkPool rows — driver-light at any corpus size) keeping each
    * parent's best chunk by (score DESC, chunk id ASC), and takes the top
    * `k` parents by (score DESC, parent ASC).
    * Output: (parentCol, best_chunk, score).
    */
  def topKParents(chunks: DataFrame, chunkIdCol: String, parentCol: String,
                  embCol: String, query: Seq[Float], k: Int,
                  chunkPool: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = topK(chunks.select(col(chunkIdCol), col(parentCol), col(embCol)),
      chunkIdCol, embCol, query, chunkPool)
    val w = Window.partitionBy(col(parentCol))
      .orderBy(col("score").desc, col(chunkIdCol))
    hits.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(parentCol), col(chunkIdCol).as("best_chunk"), col("score"))
      .orderBy(col("score").desc, col(parentCol))
      .limit(k)
  }

  /** One scored (score, id) pair flowing into the top-k aggregator. */
  case class Scored(score: Double, id: Long)

  /** Bounded top-k buffer. `thrScore`/`thrId` record the k-th best element
    * as of the last trim (better = higher score, ties to lower id) — a safe
    * stale threshold: the true k-th best only improves afterwards, so
    * anything at or below it can never reach the final top-k.
    */
  case class TopKBuf(thrScore: Double, thrId: Long, xs: Seq[Scored])

  /** Bounded top-k aggregator. The buffer never exceeds 2k entries, so
    * partial (map-side) aggregation ships O(k) per partition per group; the
    * sort-based trim every k accepted rows is O(log k) amortized per row.
    * The hot path is the threshold REJECT: on a large corpus almost every
    * row scores below the running k-th best and returns the buffer
    * untouched — no allocation, no comparison beyond the threshold test.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    private def ord = Ordering.by[Scored, (Double, Long)](x => (-x.score, x.id))
    private def trimmed(xs: Seq[Scored]): TopKBuf = {
      val kept = xs.sorted(ord).take(k)
      val worst = kept.last
      TopKBuf(worst.score, worst.id, kept)
    }
    def zero: TopKBuf = TopKBuf(Double.NegativeInfinity, Long.MaxValue, Nil)
    // threshold comparisons MUST use the same TOTAL order as `ord`
    // (java.lang.Double.compare: -0.0 < 0.0, NaN greatest). IEEE `<`/`==`
    // here treats -0.0 == 0.0, so a +0.0-scored row could be fast-path
    // rejected by a -0.0 threshold it actually beats under `ord` —
    // falsified by the partition-fold property after a seed that
    // quantized scores to negative zero.
    def reduce(b: TopKBuf, a: Scored): TopKBuf = {
      val c = java.lang.Double.compare(a.score, b.thrScore)
      if (c < 0 || (c == 0 && a.id >= b.thrId)) b
      else {
        val xs2 = a +: b.xs
        if (xs2.size <= 2 * k) b.copy(xs = xs2) else trimmed(xs2)
      }
    }
    def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
      val xs2 = b1.xs ++ b2.xs
      // either side's threshold is a valid (stale) lower bound on the merged
      // k-th best; keep the tighter one
      val c = java.lang.Double.compare(b2.thrScore, b1.thrScore)
      val (ts, ti) =
        if (c > 0 || (c == 0 && b2.thrId < b1.thrId))
          (b2.thrScore, b2.thrId)
        else (b1.thrScore, b1.thrId)
      if (xs2.size <= 2 * k) TopKBuf(ts, ti, xs2) else trimmed(xs2)
    }
    def finish(r: TopKBuf): Seq[Scored] = r.xs.sorted(ord).take(k)
    def bufferEncoder = Encoders.product[TopKBuf]
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Batched top-k: one job scores |queries| x |corpus| pairs but aggregates
    * with map-side bounded heaps, so only O(k) rows per query per partition
    * shuffle. `queries`: (qid, vector). Output: (qid, neighbor id, score, rank).
    */
  def topKBatch(corpus: DataFrame, idCol: String, embCol: String,
                queries: Seq[(Long, Seq[Float])], k: Int,
                filter: Column = lit(true)): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val topkUdaf = udaf(new TopKAgg(k), Encoders.product[Scored])
    val qDf = queries.toDF("qid", "qvec")
    corpus.where(filter && col(embCol).isNotNull)
      .crossJoin(broadcast(qDf))
      .select(col("qid"),
        cosineSim(col(embCol), col("qvec")).as("score"),
        col(idCol).cast("long").as("nid"))
      .groupBy("qid")
      .agg(topkUdaf(col("score"), col("nid")).as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as("score"))
  }

  /** Batched IVF search: [[topKBatch]]'s one-job shape with each query
    * restricted to its own `nProbe` nearest cells — the per-query probe
    * lists ride the broadcast as an array column and prune via
    * `array_contains` BEFORE any scoring. On a corpus persisted
    * `partitionBy(assignCol)` the union of all queries' cells is the only
    * data read; within it each row scores only against the queries probing
    * its cell, so the scored-pair count is Σ_q |probed(q)|, not
    * |queries| × |corpus|. Output: (qid, rank, idCol, score).
    */
  def topKBatchIvf(corpus: DataFrame, idCol: String, embCol: String,
                   assignCol: String, centroids: Seq[Seq[Float]],
                   queries: Seq[(Long, Seq[Float])], k: Int,
                   nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val topkUdaf = udaf(new TopKAgg(k), Encoders.product[Scored])
    val qDf = queries.map { case (qid, qv) =>
      (qid, qv, probeCellsFor(centroids, qv, nProbe))
    }.toDF("qid", "qvec", "qcells")
    corpus.where(col(embCol).isNotNull)
      .crossJoin(broadcast(qDf))
      .where(array_contains(col("qcells"), col(assignCol)))
      .select(col("qid"),
        cosineSim(col(embCol), col("qvec")).as("score"),
        col(idCol).cast("long").as("nid"))
      .groupBy("qid")
      .agg(topkUdaf(col("score"), col("nid")).as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as("score"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query (typically an anchor document's own embedding), the top `nNeg`
    * most-similar corpus rows whose LABEL DIFFERS — the lookalikes a
    * margin loss learns the most from. [[graft.operators.Sampling.ringNegatives]]
    * draws negatives uniformly-at-hash; this draws them adversarially from
    * the decision boundary. Same one-job shape as [[topKBatch]]: queries
    * (with their labels) ride a broadcast, scoring is map-side codegen
    * cosine, and the bounded [[TopKAgg]] heap keeps nNeg per query — the
    * label exclusion is a pre-aggregation filter, so same-label rows never
    * enter the heap (and the anchor can never mine itself). Ties break
    * (score DESC, id ASC) like every ranking here.
    */
  def hardNegatives(corpus: DataFrame, idCol: String, embCol: String,
                    labelCol: String, queries: Seq[(Long, Seq[Float], Int)],
                    nNeg: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val topkUdaf = udaf(new TopKAgg(nNeg), Encoders.product[Scored])
    val qDf = queries.toDF("qid", "qvec", "qlabel")
    corpus.where(col(embCol).isNotNull && col(labelCol).isNotNull)
      .crossJoin(broadcast(qDf))
      .where(col(labelCol) =!= col("qlabel"))
      .select(col("qid"),
        cosineSim(col(embCol), col("qvec")).as("score"),
        col(idCol).cast("long").as("nid"))
      .groupBy("qid")
      .agg(topkUdaf(col("score"), col("nid")).as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as("score"))
  }

  /** Deterministic ±1 projection matrix (outDim rows × dim) for
    * Johnson-Lindenstrauss sign projection — the dense-but-cheap member
    * of the Achlioptas family (±1 entries preserve pairwise distances in
    * expectation exactly like gaussians, with integer-weight dot
    * products). Seeded, so both the engine plan and the oracle
    * transcription are built from the SAME literal matrix.
    */
  def signMatrix(dim: Int, outDim: Int, seed: Long = 99L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(dim)(if (rnd.nextBoolean()) 1f else -1f))
  }

  /** Append a JL sign-projected embedding: out[j] = dot(emb, signs[j]),
    * each a codegen index-order double fold rounded once to float32 —
    * both engines reproduce the bits. Pure map-side projection (no
    * shuffle); at 100 TB this is the scan-cost lever: a 64→16
    * projection quarters the bytes every downstream distance scan
    * touches, and the projected column feeds the ENTIRE existing ANN
    * stack (brute/IVF/LSH/HNSW) unchanged, with exact rerank over the
    * original vectors restoring full-precision order on the bounded
    * candidate pool.
    */
  def withSignProjection(df: DataFrame, embCol: String,
                         signs: Seq[Seq[Float]], outCol: String): DataFrame =
    df.withColumn(outCol,
      array(signs.map(s => dotProduct(col(embCol), typedlit(s)).cast("float")): _*))

  /** Deterministic seeded gaussian hyperplanes for sign-bit LSH. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Add a sign-bit LSH bucket column: bit i = (emb . plane_i) >= 0.
    * Near-identical vectors land in the same bucket with high probability;
    * bucket is then a blocking key for [[Dedup.embeddingNearDupPairs]] or a
    * pre-filter for search. Pure per-row projection — no shuffle.
    */
  def withHyperplaneBuckets(df: DataFrame, embCol: String,
                            planes: Seq[Seq[Float]],
                            bucketCol: String = "lsh_bucket"): DataFrame = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dotProduct(col(embCol), typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    df.withColumn(bucketCol, bits.reduce(_ + _))
  }

  /** Assign each row to its nearest centroid (IVF coarse quantizer).
    * Centroids are broadcast as literals; assignment is a per-row argmax —
    * no shuffle. Persist partitioned by this column and a query probing
    * nProbe centroids prunes (1 - nProbe/nCentroids) of the corpus scan.
    */
  def withIvfAssignment(df: DataFrame, embCol: String,
                        centroids: Seq[Seq[Float]],
                        assignCol: String = "ivf_cell"): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosineSim(col(embCol), typedlit(c)).as("s"), lit(i).as("i"))
    }
    df.withColumn(assignCol, greatest(scored: _*).getField("i"))
  }

  /** Pick deterministic IVF centroids: the first `n` rows by id. (A k-means
    * refinement is a drop-in improvement; centroid quality affects recall,
    * not the plan shape.) Biased toward whatever the low ids contain — use
    * [[farthestPointCentroids]] when seed spread matters.
    */
  def sampleCentroids(df: DataFrame, idCol: String, embCol: String, n: Int): Seq[Seq[Float]] =
    df.where(col(embCol).isNotNull)
      .orderBy(col(idCol)).limit(n)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq

  /** Deterministic farthest-point (k-center greedy) seeding — the k-means++
    * idea with the randomness replaced by argmax selection, so the seeds
    * are reproducible across runs and partitionings. Seed 1 is the row
    * with the minimum hash-uniform of its id (an arbitrary-but-fixed
    * start, decoupled from id order); each further seed is the row whose
    * best cosine similarity to the chosen set is LOWEST (ties to lower
    * id). k-1 single-row max-aggregations over the corpus — k jobs, no
    * shuffle growth, centroids broadcast as literals; the standard
    * driver-side seeding loop for small k. Unlike first-n-by-id, the
    * seeds provably spread: each new seed is the point worst-covered by
    * the current set.
    */
  def farthestPointCentroids(df: DataFrame, idCol: String, embCol: String,
                             k: Int): Seq[Seq[Float]] = {
    require(k > 0, "k must be positive")
    val rows = df.where(col(embCol).isNotNull)
    // one count job up front (the seeding loop already runs k jobs): with
    // k above the candidate count the argmin would silently re-pick the
    // same row and emit duplicate centroids; empty input would surface as
    // an opaque NoSuchElementException from head()
    val n = rows.count()
    require(k <= n,
      s"farthestPointCentroids: k=$k exceeds the $n rows with a non-null " +
        s"$embCol — duplicate centroids are never what a caller wants")
    val first = rows
      .orderBy(graft.operators.Sampling.uniformFromId(col(idCol), ":seed"),
        col(idCol))
      .select(embCol).head().getSeq[Float](0).toSeq
    val picked = scala.collection.mutable.ArrayBuffer(first)
    while (picked.size < k) {
      // coverage = best similarity to any chosen seed; next seed = argmin
      val coverage = picked.map(c => cosineSim(col(embCol), typedlit(c)))
        .reduce(greatest(_, _))
      val next = rows
        .orderBy(coverage.asc, col(idCol))
        .select(embCol).head().getSeq[Float](0).toSeq
      picked += next
    }
    picked.toSeq
  }

  /** Spherical k-means refinement of IVF centroids (Lloyd iterations with
    * cosine assignment and L2-normalized means). Each iteration is one
    * assignment projection (no shuffle) + one two-level aggregation
    * (posexplode -> avg per (cell, dim)) — shuffle size k x dim rows, never
    * corpus-sized. Empty cells keep their previous centroid.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, embCol: String,
                      k: Int, iters: Int = 5): Seq[Seq[Float]] = {
    var cents = sampleCentroids(df, idCol, embCol, k)
    val dim = cents.head.length
    (1 to iters).foreach { _ =>
      val assigned = withIvfAssignment(df.where(col(embCol).isNotNull), embCol, cents)
      val means = assigned
        .select(col("ivf_cell"), posexplode(col(embCol)))
        .groupBy(col("ivf_cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          val norm = math.sqrt(v.map(x => x * x).sum)
          cell -> (if (norm > 0) v.map(x => (x / norm).toFloat).toSeq
                   else cents(cell))
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Per-label embedding-space cohesion profile: each label's centroid
    * (L2-normalized per-dim mean, rounded to FLOAT — q52's bit-portability
    * trick: the rounding absorbs engine summation-order ulps) and the
    * min/max cosine of the label's own vectors to it. The "are my class
    * labels actually clusters" audit a multimodal/embedding pipeline runs
    * before trusting label-blocked dedup or IVF-per-label routing.
    *
    * Output doubles are order-free (count/min/max over in-order per-row
    * folds), never a row-summed double — which is what keeps the whole
    * thing oracle-portable. Shape at scale: one (label, pos) shuffle for
    * the means (map-side partial avg), centroids broadcast back, min/max
    * aggregate map-side. Labels are assumed bounded (classes, not keys).
    */
  def labelCohesion(df: DataFrame, embCol: String, labelCol: String): DataFrame = {
    val means = df.where(col(embCol).isNotNull)
      .select(col(labelCol).as("__lbl"), posexplode(col(embCol)))
      .groupBy(col("__lbl"), col("pos"))
      .agg(avg(col("col")).as("m"))
    val cents = means.groupBy("__lbl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mv"))
      .withColumn("nrm", sqrt(aggregate(col("mv"), lit(0.0),
        (a, x) => a + x * x)))
      .where(col("nrm") > 0)
      .select(col("__lbl"),
        transform(col("mv"), x => (x / col("nrm")).cast("float")).as("cv"))
    df.join(broadcast(cents), col(labelCol) === col("__lbl"))
      .withColumn("__cos", cosineSim(col(embCol), col("cv")))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("__cos")).as("min_cos"), max(col("__cos")).as("max_cos"))
  }

  /** IVF-pruned approximate top-k: score only rows in the `nProbe` cells
    * nearest to the query. With the corpus persisted partitionBy(ivf_cell),
    * the isin() filter becomes partition pruning — the scan itself shrinks.
    */
  def topKIvf(corpusWithCells: DataFrame, idCol: String, embCol: String,
              assignCol: String, centroids: Seq[Seq[Float]],
              query: Seq[Float], k: Int, nProbe: Int): DataFrame = {
    val cells = probeCellsFor(centroids, query, nProbe)
    topK(corpusWithCells, idCol, embCol, query, k,
      col(assignCol).isin(cells: _*))
  }

  /** Matryoshka prefix-dimension search (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS'22 — embeddings trained so every
    * prefix is itself a usable embedding): candidates rank on the FIRST
    * `prefixDim` coordinates only, then the k·rerankFactor survivors
    * rerank under the exact full-dimension cosine. Returned scores are
    * the exact full-dim fold — like every prune-and-rerank tier here
    * (SQ8/PQ/binary), the candidate SET is the approximation, the
    * scores never are. With rerankFactor large enough to cover the
    * corpus this IS [[topK]] (AnnSpec pins it).
    *
    * Both stages are `TakeOrderedAndProject` (per-partition heaps, no
    * global sort); the rerank input is k·rerankFactor rows, driver-
    * bounded. At 100 TB the point of MRL is that the candidate stage
    * reads prefixDim/dim of the vector bytes: materialize the prefix as
    * its OWN column at write time (`withColumn("emb_pfx",
    * slice(col(emb), 1, d))` before the parquet write) and pass that
    * frame here — column pruning then keeps the full vectors out of the
    * candidate scan entirely; the in-plan `slice` below is the
    * layout-free form the oracle gates.
    */
  def topKMatryoshka(corpus: DataFrame, idCol: String, embCol: String,
                     query: Seq[Float], k: Int, prefixDim: Int,
                     rerankFactor: Int = 4,
                     filter: Column = lit(true)): DataFrame = {
    require(prefixDim >= 1 && prefixDim <= query.size,
      s"prefixDim $prefixDim out of range 1..${query.size}")
    require(rerankFactor >= 1, s"rerankFactor $rerankFactor must be >= 1")
    val qPrefix = query.take(prefixDim)
    val cand = corpus.where(filter && col(embCol).isNotNull)
      .withColumn("__graft_pfx",
        cosineSim(slice(col(embCol), 1, prefixDim), typedlit(qPrefix)))
      .orderBy(col("__graft_pfx").desc, col(idCol))
      .limit(k * rerankFactor)
      .drop("__graft_pfx")
    cand.withColumn("score", cosineSim(col(embCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------ PQ

  /** Squared L2 distance between an array<float> column and a literal
    * sub-centroid, as an in-order double fold (each element cast to double
    * BEFORE subtracting — the [[cosineSim]] promotion rule, so DuckDB's
    * list_sum fold reproduces it bit-for-bit).
    */
  private def l2Sq(a: Column, b: Seq[Float]): Column =
    aggregate(zip_with(a, typedlit(b), (x, y) =>
      (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))), lit(0.0), _ + _)

  /** Argmin cell over a codebook by squared L2, ties to the lower index. */
  private def pqArgmin(sub: Column, cents: Seq[Seq[Float]]): Column =
    least(cents.zipWithIndex.map { case (c, i) =>
      struct(l2Sq(sub, c).as("d"), lit(i).as("i"))
    }: _*).getField("i")

  /** Product-quantization codebooks (Jegou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): the embedding dim splits
    * into `m` subspaces, each with its own `ksub`-centroid codebook, so a
    * vector encodes to m small ints — dim x 4 bytes -> m bytes at
    * ksub=256. This is the ANN memory story past IVF: the cell list prunes
    * the scan, PQ shrinks what remains (~32x) so probed lists stay in
    * executor memory at 100 TB corpus scale.
    *
    * `iters = 0` keeps the deterministic first-ksub-by-id seeds — the
    * oracle-portable form the gate verifies end-to-end (sampled sub-
    * centroids are slices of the first ksub vectors, reproducible in SQL).
    * `iters > 0` runs plain-L2 Lloyd refinement per subspace (better
    * codebooks, identical plan shapes; distortion monotonicity is
    * spec-verified). Each iteration per subspace: one no-shuffle argmin
    * projection + one (cell, pos) aggregation of k x d rows — never
    * corpus-sized. Empty cells keep their previous centroid.
    */
  def pqCodebooks(df: DataFrame, idCol: String, embCol: String,
                  m: Int, ksub: Int, iters: Int = 0): Seq[Seq[Seq[Float]]] = {
    require(m > 0 && ksub > 0, s"m=$m, ksub=$ksub must be positive")
    val rows = df.where(col(embCol).isNotNull)
    val dim = rows.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val d = dim / m
    (0 until m).map { j =>
      val sub = rows.select(col(idCol),
        slice(col(embCol), j * d + 1, d).as("__graft_sub"))
      var cents = sampleCentroids(sub, idCol, "__graft_sub", ksub)
      (1 to iters).foreach { _ =>
        val means = sub
          .withColumn("__graft_cell", pqArgmin(col("__graft_sub"), cents))
          .select(col("__graft_cell"), posexplode(col("__graft_sub")))
          .groupBy("__graft_cell", "pos")
          .agg(avg(col("col")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cell, rs) =>
            val v = new Array[Float](d)
            rs.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
            cell -> v.toSeq
          }
        cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
      }
      cents
    }
  }

  /** Encode each vector as its per-subspace argmin codes (array<int>,
    * length m). Pure per-row projection — no shuffle; m x ksub x (dim/m)
    * fused multiply-adds per row, the same arithmetic budget as any PQ
    * encoder. Null embeddings encode to null.
    */
  def withPqCodes(df: DataFrame, embCol: String,
                  codebooks: Seq[Seq[Seq[Float]]],
                  codeCol: String = "pq_code"): DataFrame = {
    val d = codebooks.head.head.size
    df.withColumn(codeCol,
      when(col(embCol).isNull, lit(null))
        .otherwise(array(codebooks.zipWithIndex.map { case (cb, j) =>
          pqArgmin(slice(col(embCol), j * d + 1, d), cb)
        }: _*)))
  }

  /** Asymmetric-distance PQ search: the query's per-subspace distances to
    * every sub-centroid form an m x ksub lookup table (driver-computed,
    * shipped as ONE literal — bytes, not vectors); each row's approximate
    * distance is m table lookups summed in-row, so the scan never touches
    * the original embeddings. The `rerankFactor * k` best candidates by
    * ADC (TakeOrderedAndProject — bounded per-partition heaps) are then
    * re-scored with exact cosine and the true top-k of the candidate set
    * returned — the standard PQ re-rank that restores exact ordering
    * whenever the candidate set covers the true neighbors (recall
    * spec-verified; the gate pins the full pipeline bit-exactly).
    */
  def topKPq(corpus: DataFrame, idCol: String, embCol: String,
             codeCol: String, codebooks: Seq[Seq[Seq[Float]]],
             query: Seq[Float], k: Int, rerankFactor: Int = 4,
             filter: Column = lit(true)): DataFrame = {
    require(k > 0 && rerankFactor >= 1, s"k=$k, rerankFactor=$rerankFactor")
    val table: Seq[Seq[Double]] = adcTableFor(codebooks, query)
    val adc = aggregate(
      zip_with(col(codeCol), typedlit(table), (c, t) => element_at(t, c + 1)),
      lit(0.0), _ + _)
    corpus.where(filter && col(codeCol).isNotNull)
      .withColumn("__graft_adc", adc)
      .orderBy(col("__graft_adc").asc, col(idCol))
      .limit(math.max(k, rerankFactor * k))
      .withColumn("score", cosineSim(col(embCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .drop("__graft_adc")
  }

  /** The composed ≥1M-vector search shape (reference scaling envelope
    * `/root/reference/02_method2_manual_vector_embedding.sql:438-442`):
    * IVF prunes the SCAN (with the corpus persisted
    * `partitionBy(assignCol)`, the `isin` over the `nProbe` query-nearest
    * cells becomes partition pruning — (1 - nProbe/nCells) of the corpus is
    * never read), PQ shrinks what REMAINS (ADC over the m-byte codes, the
    * embeddings untouched), and the exact-cosine re-rank of the
    * `rerankFactor * k` ADC-best restores exact ordering whenever the
    * candidate set covers the true neighbors. Each stage's contract is
    * individually gated (q45 / q118); the composition is q129's.
    */
  def topKIvfPq(corpus: DataFrame, idCol: String, embCol: String,
                assignCol: String, codeCol: String,
                ivfCentroids: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]],
                query: Seq[Float], k: Int, nProbe: Int,
                rerankFactor: Int = 4): DataFrame = {
    val cells = probeCellsFor(ivfCentroids, query, nProbe)
    topKPq(corpus, idCol, embCol, codeCol, codebooks, query, k, rerankFactor,
      col(assignCol).isin(cells: _*))
  }

  /** Multi-probe LSH probe set (Lv et al., "Multi-Probe LSH", VLDB 2007):
    * the query's own sign bucket plus every single-bit flip — the buckets
    * just across each hyperplane boundary, where near-boundary true
    * neighbors land. Buys recall WITHOUT more hash tables: probed rows
    * grow ~(1 + nBits)/2^nBits of the corpus instead of another full
    * index copy. Deterministic: probes in bit order after the home
    * bucket (ordering is immaterial to the result — the search scores
    * the UNION exactly).
    */
  def multiProbeBuckets(query: Seq[Float], planes: Seq[Seq[Float]]): Seq[Long] = {
    val home = planes.zipWithIndex
      .map { case (p, i) => if (dot(query, p) >= 0) 1L << i else 0L }.sum
    home +: planes.indices.map(i => home ^ (1L << i))
  }

  /** Exact top-k over the multi-probe bucket union — the
    * [[withHyperplaneBuckets]] scale path with boundary insurance.
    * On a bucket-partitioned layout the isin is partition pruning.
    */
  def topKLshMultiProbe(corpus: DataFrame, idCol: String, embCol: String,
                        bucketCol: String, planes: Seq[Seq[Float]],
                        query: Seq[Float], k: Int): DataFrame =
    topK(corpus, idCol, embCol, query, k,
      col(bucketCol).isin(multiProbeBuckets(query, planes): _*))

  /** Residual projection for IVF-PQ: r = x − centroid(cell), elementwise
    * in double then rounded to float32 (both engines' double→REAL cast is
    * the same IEEE rounding). Residuals are what the PRODUCTION IVF-PQ
    * codes (Jegou et al. §IV-A: within a cell the residuals cluster around
    * zero, so the same m×ksub codebook budget spends its centroids on a
    * much tighter distribution than raw vectors — lower distortion, better
    * candidate recall at equal bytes). Pure map-side projection (centroids
    * ride as literals, the cell picks one with element_at).
    */
  def withResiduals(df: DataFrame, embCol: String, assignCol: String,
                    ivfCentroids: Seq[Seq[Float]],
                    outCol: String = "residual"): DataFrame =
    df.withColumn(outCol,
      zip_with(col(embCol),
        element_at(typedlit(ivfCentroids), col(assignCol) + 1),
        (a, b) => (a.cast("double") - b.cast("double")).cast("float")))

  /** Driver-side residual of a query against one centroid — the same
    * double-subtract-then-float32 rounding as [[withResiduals]].
    */
  def residualOf(query: Seq[Float], centroid: Seq[Float]): Seq[Float] = {
    require(query.length == centroid.length,
      s"dim mismatch ${query.length} vs ${centroid.length}")
    query.zip(centroid).map { case (a, b) => (a.toDouble - b.toDouble).toFloat }
  }

  /** Residual-encoded IVF-PQ search (the FAISS `IndexIVFPQ` layout): rows
    * carry codes of their RESIDUALS, so the per-request ADC table is
    * per-PROBED-CELL — distances of the QUERY'S residual against that
    * cell to the (shared) residual codebooks. nProbe bounded ⇒ the table
    * set is nProbe × m × ksub doubles shipped as literals; the per-row
    * work is the same m lookups as [[topKPq]], selected by the row's cell
    * through a when-ladder (codegen'd, no join). Exact-cosine rerank over
    * the ORIGINAL embeddings restores exact ordering of the candidate set.
    */
  def topKIvfResidualPq(corpus: DataFrame, idCol: String, embCol: String,
                        assignCol: String, codeCol: String,
                        ivfCentroids: Seq[Seq[Float]],
                        codebooks: Seq[Seq[Seq[Float]]],
                        query: Seq[Float], k: Int, nProbe: Int,
                        rerankFactor: Int = 4): DataFrame = {
    require(k > 0 && rerankFactor >= 1, s"k=$k, rerankFactor=$rerankFactor")
    val cells = probeCellsFor(ivfCentroids, query, nProbe)
    def adcFor(cell: Int): Column = {
      val table = adcTableFor(codebooks, residualOf(query, ivfCentroids(cell)))
      aggregate(
        zip_with(col(codeCol), typedlit(table), (c, t) => element_at(t, c + 1)),
        lit(0.0), _ + _)
    }
    val adcCol = cells.tail.foldLeft(
      when(col(assignCol) === cells.head, adcFor(cells.head))) {
      (acc, c) => acc.when(col(assignCol) === c, adcFor(c))
    }
    corpus.where(col(assignCol).isin(cells: _*) && col(codeCol).isNotNull)
      .withColumn("__graft_adc", adcCol)
      .orderBy(col("__graft_adc").asc, col(idCol))
      .limit(math.max(k, rerankFactor * k))
      .withColumn("score", cosineSim(col(embCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .drop("__graft_adc")
  }

  /** Driver-side dot product (same fold order as the Catalyst expression;
    * this is the sign test hyperplane bucketing uses — unlike cosine it is
    * 0.0, not NaN, for a zero-norm vector).
    */
  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    require(a.length == b.length, s"dim mismatch ${a.length} vs ${b.length}")
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** Driver-side cosine (same fold order as the Catalyst expression). */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    require(a.length == b.length, s"dim mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** THE cell-probe rule — one definition shared by every IVF
    * composition (dense, ×PQ, ×SQ8, ×binary) and the memory tier's
    * [[graft.serve.MemoryAnnIndex.probeCells]]: cells ranked by
    * (cosine to centroid DESC, cell id ASC), top `nProbe`. The
    * memory/DataFrame bit-parity contracts depend on there being
    * exactly one copy of this rule.
    */
  def probeCellsFor(centroids: Seq[Seq[Float]], query: Seq[Float],
                    nProbe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (cosine(query, c), i) }
      .sortBy(x => (-x._1, x._2)).take(nProbe).map(_._2)

  /** THE per-request ADC table — shared by [[topKPq]]'s plan literal and
    * [[graft.serve.MemoryPqIndex]]: per subspace, squared-L2 of the
    * query slice to each sub-centroid, in-order double fold.
    */
  def adcTableFor(codebooks: Seq[Seq[Seq[Float]]],
                  query: Seq[Float]): Seq[Seq[Double]] = {
    val d = codebooks.head.head.size
    codebooks.zipWithIndex.map { case (cb, j) =>
      val qs = query.slice(j * d, (j + 1) * d)
      cb.map { c =>
        var s = 0.0
        var i = 0
        while (i < d) {
          val diff = qs(i).toDouble - c(i).toDouble
          s += diff * diff
          i += 1
        }
        s
      }
    }
  }

  /** Deterministic mixture-of-Gaussians embedding fixture: `nClusters`
    * seeded unit-direction centers; point i = normalize(center_{i mod K}
    * + noise) where the gaussian noise's per-coordinate sigma is
    * spread/√dim — so the noise VECTOR norm is ≈ `spread` relative to
    * the unit center regardless of dimension (unscaled per-coordinate
    * noise would swamp the center at high dim: norm grows √dim). Expected
    * same-cluster cosine ≈ 1/(1+spread²). Everything drawn from
    * per-index-seeded RNGs so the corpus is identical across runs and
    * partitionings. This is the CLUSTERED regime real text/image
    * embeddings live in — the testdata embeddings are isotropic (the
    * hardest case for cell-probing ANN), so recall tuning needs both
    * curves (tools/RecallReport measures them; RECALL.md carries the
    * result).
    */
  def syntheticClusteredEmbeddings(spark: org.apache.spark.sql.SparkSession,
                                   n: Int, dim: Int, nClusters: Int,
                                   spread: Double = 0.25,
                                   seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val centers = (0 until nClusters).map { c =>
      val r = new scala.util.Random(seed * 7919L + c)
      val v = Array.fill(dim)(r.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat).toIndexedSeq
    }
    val bcCenters = spark.sparkContext.broadcast(centers)
    val sigma = spread / math.sqrt(dim)
    spark.range(n).map { i =>
      val cluster = (i % nClusters).toInt
      val center = bcCenters.value(cluster)
      val r = new scala.util.Random(seed * 1000003L + i)
      val raw = Array.tabulate(dim)(j =>
        center(j) + sigma * r.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i, cluster, raw.map(x => (x / norm).toFloat).toSeq)
    }.toDF("vec_id", "cluster", "embedding")
  }

  /** Pick the smallest probe width whose MEASURED recall meets the
    * target — the tuning contract RECALL.md's curves feed. `curve` is
    * (nProbe, measured recall@k) from `tools/RecallReport` (any order);
    * returns the cheapest point at or above `recallTarget`, or the
    * widest probe when the target is unreachable (the caller then knows
    * the index itself — not the probe width — is the limiter).
    * Monotone by construction: a higher target never picks a narrower
    * probe (AnnSpec pins this).
    */
  def pickNProbe(curve: Seq[(Int, Double)], recallTarget: Double): Int = {
    require(curve.nonEmpty, "pickNProbe needs a measured curve")
    val sorted = curve.sortBy(_._1)
    // enforce the physical monotonicity (recall can only grow with more
    // cells scanned) against measurement noise: running max
    val mono = sorted.scanLeft((0, 0.0)) { case ((_, best), (p, r)) =>
      (p, math.max(best, r))
    }.drop(1)
    mono.find(_._2 >= recallTarget).map(_._1).getOrElse(sorted.last._1)
  }
}
