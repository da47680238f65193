package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): per-vector affine int8 codes —
  * code_i = clamp(round((x_i − min)/scale)), scale = (max − min)/255 —
  * the other standard embedding-compression form next to product
  * quantization (`Ann`'s PQ/IVF×PQ): 4× smaller than float32 with no
  * codebook training, decoded by one fused multiply-add. FAISS calls it
  * SQ8; at 100 TB it is usually the FIRST compression applied (PQ needs a
  * train step; SQ8 is stateless per vector, so it maps over any partition
  * with no broadcast at all).
  *
  * Everything is pinned IEEE arithmetic (round = floor(q + 0.5), clamp via
  * greatest/least), so codes AND reconstruction metrics are bit-identical
  * across engines — the [[graft.functions.DetMath]] rule applied to a
  * compression codec. A constant vector (max == min) takes scale 1 and
  * codes 0 — reconstruction is exact, no 0/0.
  */
object Quantize {

  private def minMaxScale(xs: Column): (Column, Column, Column) = {
    val mn = array_min(xs)
    val mx = array_max(xs)
    val scale = when(mx === mn, lit(1.0))
      .otherwise((mx - mn) / lit(255.0))
    (mn, mx, scale)
  }

  private def codeOf(x: Column, mn: Column, scale: Column): Column =
    greatest(lit(0.0), least(lit(255.0), floor((x - mn) / scale + lit(0.5))))

  /** All input columns plus the compressed form (codes array<int>, mn,
    * scale) AND the scan-time scalars `csum` = Σc, `csum2` = Σc² — both
    * integer-valued (codes are 0..255), so they are EXACT doubles with no
    * fold-order sensitivity. Staging them at encode time is what lets
    * [[topKSq8]] score a row with one codegen dot over the codes instead
    * of dequantizing per query (the algebra in [[topKSq8]]'s doc).
    * [[sq8Codes]] is the narrow select.
    */
  def withSq8(emb: DataFrame, vecCol: String): DataFrame = {
    // ONE codegen pass per row (functions/Sq8Encode) — the encode is the
    // full-corpus index-build scan, and as interpreted HOF trees it cost
    // more than the searches it serves (measured 8× the whole query at
    // 10×). Whole-stage CSE collapses the five field extractions to a
    // single evaluation.
    emb.withColumn("__sq8",
        graft.functions.VectorFunctions.sq8Encode(col(vecCol)))
      .withColumn("codes", col("__sq8.codes"))
      .withColumn("mn", col("__sq8.mn"))
      .withColumn("scale", col("__sq8.scale"))
      .withColumn("csum", col("__sq8.csum"))
      .withColumn("csum2", col("__sq8.csum2"))
      .drop("__sq8")
  }

  /** The compressed form: (id, codes array<int>, mn, scale). */
  def sq8Codes(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    withSq8(emb, vecCol).select(idCol, "codes", "mn", "scale")

  /** SQ8-accelerated top-k: the approximate pass scores the codes
    * WITHOUT dequantizing, then the exact cosine re-ranks the
    * `rerankFactor·k` best — the same prune-then-rerank contract as
    * [[Ann.topKPq]], with SQ8's codebook-free codec. Compose with an IVF
    * cell filter for the partition-pruned form.
    *
    * The approximate cosine over the dequantized vector d = mn + c·s is
    * computed ALGEBRAICALLY from the codes and the encode-time scalars:
    *   dot(q, d)  = mn·Σq + s·dot(q, c)
    *   ‖d‖²       = dim·mn² + 2·mn·s·Σc + s²·Σc²
    * so the per-row scan work is ONE codegen'd int·double fold
    * ([[graft.functions.CodeDot]]) plus a handful of scalar ops — the
    * same Tungsten shape as the exact [[graft.functions.CosineSimilarity]]
    * scan, over the 4×-smaller code column. (The previous form
    * dequantized per row with interpreted higher-order functions and was
    * ~65× SLOWER than the exact codegen scan at 10× scale — compression
    * only pays when the scoring kernel stays in codegen.) Σq and ‖q‖ are
    * driver-side ordered folds over the query literal; Σc/Σc² are
    * integer-exact, so every float op here has one pinned association
    * order shared with the DuckDB oracle twin.
    */
  def topKSq8(corpus: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, rerankFactor: Int = 4,
              filter: Column = lit(true)): DataFrame = {
    require(k > 0 && rerankFactor >= 1)
    val qd = query.map(_.toDouble)
    // ordered folds, exactly the oracle's list_sum over the query literal
    val qn = math.sqrt(qd.foldLeft(0.0)((a, x) => a + x * x))
    val sq = qd.foldLeft(0.0)((a, x) => a + x)
    val qdot = graft.functions.VectorFunctions.codeDot(
      col("codes"), typedlit(qd))
    val num = col("mn") * lit(sq) + col("scale") * qdot
    val den = sqrt(
      lit(query.length.toDouble) * col("mn") * col("mn") +
        lit(2.0) * col("mn") * col("scale") * col("csum") +
        col("scale") * col("scale") * col("csum2")) * lit(qn)
    corpus.where(filter && col("codes").isNotNull)
      .withColumn("__sq8_approx", num / den)
      .orderBy(col("__sq8_approx").desc, col(idCol))
      .limit(math.max(k, rerankFactor * k))
      .withColumn("score",
        graft.functions.VectorFunctions.cosineSim(col(vecCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .drop("__sq8_approx")
  }

  /** The composed form (the [[Ann.topKIvfPq]] contract with the SQ8
    * codec): IVF prunes the SCAN to the `nProbe` query-nearest cells
    * (partition pruning under a persisted `partitionBy(assignCol)`
    * layout), SQ8 shrinks what remains, the exact rerank restores
    * ordering. Cell selection mirrors Ann's: cosine to each centroid,
    * ties to the lower cell id.
    */
  def topKIvfSq8(corpus: DataFrame, idCol: String, vecCol: String,
                 assignCol: String, ivfCentroids: Seq[Seq[Float]],
                 query: Seq[Float], k: Int, nProbe: Int,
                 rerankFactor: Int = 4): DataFrame = {
    val cells = Ann.probeCellsFor(ivfCentroids, query, nProbe)
    topKSq8(corpus, idCol, vecCol, query, k, rerankFactor,
      col(assignCol).isin(cells: _*))
  }

  /** Driver-side sign pack — the same rule as the codegen
    * [[graft.functions.SignPack]] (bit i of word i/64 set iff x_i > 0),
    * for packing a query literal once per request.
    */
  def packSigns(xs: Seq[Float]): Seq[Long] = {
    require(xs.nonEmpty, "packSigns: empty vector")
    val words = new Array[Long]((xs.length + 63) / 64)
    var i = 0
    while (i < xs.length) {
      if (xs(i) > 0.0f) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    words.toSeq
  }

  /** All input columns plus the 1-bit sign code (`bits: array<long>`,
    * ⌈dim/64⌉ words — 32× smaller than float32). The extreme point of
    * the compression ladder (SQ8 4×, PQ m·8/dim·32, sign 32×): no
    * training, no per-vector scalars, and the approximate distance is
    * integer Hamming — see [[topKBinary]].
    */
  def withBinary(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("bits",
      graft.functions.VectorFunctions.signPack(col(vecCol)))

  /** Binary-accelerated top-k: the approximate pass ranks rows by
    * Hamming distance between sign codes — one xor+popcount per 64 dims
    * ([[graft.functions.HammingDist]]), integer-exact, no float ops —
    * then the exact cosine re-ranks the `rerankFactor·k` Hamming-nearest
    * (ties to the lower id at both cuts). The same prune-then-rerank
    * contract as [[topKSq8]]/[[Ann.topKPq]] at the far end of the
    * compression ladder: at 100 TB the approximate scan reads 1/32 of
    * the bytes and the kernel is pure ALU. The sign code keeps direction
    * octants only, so rerankFactor wants to be larger than SQ8's for the
    * same recall (the RECALL.md methodology applies); with Hamming being
    * integer, the oracle twin is exact by construction — no fold-order
    * pinning needed until the rerank.
    */
  def topKBinary(corpus: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Float], k: Int, rerankFactor: Int = 8,
                 filter: Column = lit(true)): DataFrame = {
    require(k > 0 && rerankFactor >= 1)
    val qbits = packSigns(query)
    val ham = graft.functions.VectorFunctions.hammingDist(
      col("bits"), typedlit(qbits))
    corpus.where(filter && col("bits").isNotNull)
      .withColumn("__ham", ham)
      .orderBy(col("__ham"), col(idCol))
      .limit(math.max(k, rerankFactor * k))
      .withColumn("score",
        graft.functions.VectorFunctions.cosineSim(col(vecCol), typedlit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .drop("__ham")
  }

  /** IVF × binary composition (the [[topKIvfSq8]] contract with the
    * 1-bit codec): cells prune the scan (partition pruning under a
    * persisted `partitionBy(assignCol)` layout), the popcount Hamming
    * pass ranks what remains, the exact rerank restores ordering. Cell
    * selection mirrors Ann's: cosine to each centroid, ties to the
    * lower cell id. Sign packing is per-vector (no training), so it
    * commutes with the cell filter.
    */
  def topKIvfBinary(corpus: DataFrame, idCol: String, vecCol: String,
                    assignCol: String, ivfCentroids: Seq[Seq[Float]],
                    query: Seq[Float], k: Int, nProbe: Int,
                    rerankFactor: Int = 8): DataFrame = {
    val cells = Ann.probeCellsFor(ivfCentroids, query, nProbe)
    topKBinary(corpus, idCol, vecCol, query, k, rerankFactor,
      col(assignCol).isin(cells: _*))
  }

  /** Per-vector audit: quantize, dequantize, and measure — max absolute
    * reconstruction error and the cosine between the original and its
    * reconstruction (the number that decides whether SQ8 is safe for a
    * given corpus before re-ranking exact).
    */
  def sq8Report(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xs = transform(col(vecCol), x => x.cast("double"))
    val df = emb.select(col(idCol), xs.as("__xs"))
    val (mn, mx, scale) = minMaxScale(col("__xs"))
    val staged = df.withColumn("__mn", mn).withColumn("__mx", mx)
      .withColumn("__scale", scale)
      .withColumn("__ds", transform(col("__xs"),
        x => col("__mn") + codeOf(x, col("__mn"), col("__scale")) * col("__scale")))
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    val dot = fold(zip_with(col("__xs"), col("__ds"), (a, b) => a * b))
    val na = fold(transform(col("__xs"), a => a * a))
    val nb = fold(transform(col("__ds"), b => b * b))
    staged.select(col(idCol), col("__mn").as("mn"), col("__mx").as("mx"),
      col("__scale").as("scale"),
      array_max(zip_with(col("__xs"), col("__ds"),
        (a, b) => abs(a - b))).as("max_err"),
      (dot / (sqrt(na) * sqrt(nb))).as("cos_dequant"))
  }
}
