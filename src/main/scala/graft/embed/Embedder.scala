package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Text-to-dense-vector contract, re-deriving the observable behavior of the
  * reference's `EMBED_TEXT_768('e5-base-v2', text)`
  * (`/root/reference/02_method2_manual_vector_embedding.sql:170-172`,
  * `:206-208`): deterministic per text, fixed dimension, one function serving
  * BOTH corpus indexing and query embedding so cosine scores are comparable.
  *
  * Real models are pluggable behind this trait; the default is an offline,
  * dependency-free hashing TF embedder (feature hashing a la Weinberger '09 +
  * sublinear tf + L2 norm). Scores are model-relative — ordering/threshold
  * SEMANTICS are the contract, not e5-base-v2's absolute values.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Driver-side single-text embedding (for query vectors). */
  def embed(text: String): Array[Float]
  /** Column form (for corpus batch indexing). Must equal `embed` pointwise. */
  def embedCol(text: Column): Column
}

/** Deterministic hashing-TF embedder: lowercase word tokens hashed into `dim`
  * buckets (sign-hash to de-bias), sublinear tf weighting, L2-normalized.
  */
final case class HashingTfEmbedder(dim: Int = 768) extends Embedder {

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    val toks = text.toLowerCase.split("\\W+")
    val tf = new java.util.HashMap[String, Int]()
    toks.foreach { t => if (t.nonEmpty) tf.merge(t, 1, Integer.sum _) }
    if (tf.isEmpty) return v
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = scala.util.hashing.MurmurHash3.stringHash(e.getKey, 0x9747b28c)
      val idx = math.floorMod(h, dim)
      val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
      v(idx) += sign * (1.0 + math.log(e.getValue.toDouble)).toFloat
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i).toDouble; i += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
    v
  }

  private lazy val embedUdf = udf((s: String) => embed(s))
  def embedCol(text: Column): Column = embedUdf(text)
}
