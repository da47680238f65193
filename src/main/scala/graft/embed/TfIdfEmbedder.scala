package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-fitted TF-IDF embedder (the SURVEY §2.7 V1 sketch): hashing TF into
  * `dim` buckets, IDF weights fitted once on a corpus, L2 normalization —
  * the classic sparse-retrieval baseline, as a dense fixed-dim vector.
  *
  * Unlike [[HashingTfEmbedder]] (stateless), this carries the fitted IDF
  * vector, so the SAME weighting serves corpus indexing and query embedding —
  * the property that makes cosine scores comparable (`02:170-172` vs
  * `02:206-208` use one model for both sides).
  *
  * The fit is one `groupBy`-free aggregation: document frequencies per hash
  * bucket via `explode` + `approx`-free exact counts — a single shuffle of at
  * most `dim` rows per partition (map-side combined).
  */
final case class TfIdfEmbedder(dim: Int, idf: Array[Double], nDocs: Long)
    extends Embedder {

  private def bucketsOf(text: String): java.util.HashMap[Integer, Integer] = {
    val tf = new java.util.HashMap[Integer, Integer]()
    if (text == null) return tf
    text.toLowerCase.split("\\W+").foreach { t =>
      if (t.nonEmpty) {
        tf.merge(Int.box(TfIdfEmbedder.bucket(t, dim)), Int.box(1),
          (a: Integer, b: Integer) => Int.box(a + b))
      }
    }
    tf
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val it = bucketsOf(text).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val i = e.getKey.intValue()
      v(i) += ((1.0 + math.log(e.getValue.doubleValue())) * idf(i)).toFloat
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

object TfIdfEmbedder {

  def bucket(token: String, dim: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(token, 0x7f4a7c15), dim)

  /** Fit document frequencies on a corpus text column; smoothing as in MLlib
    * IDF: log((n+1)/(df+1)).
    */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 768): TfIdfEmbedder = {
    val n = corpus.count()
    val bucketUdf = udf((t: String) => bucket(t, dim))
    // df = number of DOCUMENTS with a nonzero bucket (distinct doc-bucket
    // pairs), matching MLlib's IDF-over-hashed-vectors semantics
    val dfCounts = corpus
      .select(monotonically_increasing_id().as("_did"), col(textCol))
      .select(col("_did"),
        explode(array_distinct(split(lower(col(textCol)), "\\W+"))).as("tok"))
      .where(col("tok") =!= "")
      .select(col("_did"), bucketUdf(col("tok")).as("bucket")).distinct()
      .groupBy("bucket").agg(count(lit(1)).as("df"))
      .collect()
    val idf = new Array[Double](dim)
    java.util.Arrays.fill(idf, math.log((n + 1.0) / 1.0))
    dfCounts.foreach { r =>
      idf(r.getInt(0)) = math.log((n + 1.0) / (r.getLong(1) + 1.0))
    }
    TfIdfEmbedder(dim, idf, n)
  }
}
