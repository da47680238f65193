package graft.embed

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The MLlib batch-indexing embedder (SURVEY §2.7 V1; the stated re-expression
  * of the reference's batch `EMBED_TEXT_768` pass, `02:170-172`):
  * `RegexTokenizer -> HashingTF(dim) -> IDF -> Normalizer(L2)` as an actual
  * fitted `PipelineModel`.
  *
  * Two serving paths, parity-tested to be pointwise IDENTICAL:
  *  - [[transformCorpus]]: the PipelineModel itself — the scale path for
  *    batch indexing (tokenizer/TF/IDF run as codegen-friendly ML transforms,
  *    `vector_to_array(..., float32)` lands the same `array<float>` schema
  *    the rest of the engine uses).
  *  - [[embed]] / [[embedCol]]: driver/UDF single-text path for query
  *    vectors, mirroring each pipeline stage exactly (same murmur3 bucket via
  *    `HashingTF.indexOf`, same raw-count TF, same `log((m+1)/(df+1))`
  *    smoothed IDF, same ascending-index L2 fold, same `/= norm` division,
  *    same final float32 cast) — so corpus and query scores are comparable,
  *    the invariant both reference methods rely on.
  */
final class MlLibEmbedder private (val dim: Int, val idf: Array[Double],
                                   model: PipelineModel) extends Embedder {

  @transient private lazy val htf = new HashingTF().setNumFeatures(dim)
  @transient private lazy val splitter = java.util.regex.Pattern.compile("\\W+")

  def embed(text: String): Array[Float] = {
    val out = new Array[Float](dim)
    if (text == null) return out
    val toks = splitter.split(text.toLowerCase).filter(_.nonEmpty)
    if (toks.isEmpty) return out
    // raw-count TF per bucket, ascending bucket order (= SparseVector storage
    // order, so the norm fold below sums in the same IEEE order as
    // Vectors.norm over the pipeline's sparse vector)
    val tf = new java.util.TreeMap[Integer, java.lang.Double]()
    toks.foreach { t =>
      tf.merge(Int.box(htf.indexOf(t)), Double.box(1.0),
        (a: java.lang.Double, b: java.lang.Double) => Double.box(a + b))
    }
    val n = tf.size()
    val idxs = new Array[Int](n)
    val ws = new Array[Double](n)
    var k = 0
    var norm = 0.0
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = e.getValue.doubleValue() * idf(e.getKey.intValue())
      idxs(k) = e.getKey.intValue(); ws(k) = w
      norm += w * w
      k += 1
    }
    norm = math.sqrt(norm)
    if (norm != 0.0) {
      k = 0
      while (k < n) { out(idxs(k)) = (ws(k) / norm).toFloat; k += 1 }
    } else {
      k = 0
      while (k < n) { out(idxs(k)) = ws(k).toFloat; k += 1 }
    }
    out
  }

  private lazy val embedUdf = udf((s: String) => embed(s))
  def embedCol(text: Column): Column = embedUdf(text)

  /** Batch path: run the fitted MLlib pipeline itself. Adds `outCol` as
    * `array<float>` next to the existing columns.
    */
  def transformCorpus(df: DataFrame, textCol: String,
                      outCol: String = "EMBEDDING"): DataFrame =
    model.transform(df.withColumn(MlLibEmbedder.InCol, coalesce(col(textCol), lit(""))))
      .withColumn(outCol, vector_to_array(col(MlLibEmbedder.VecCol), "float32"))
      .drop(MlLibEmbedder.InCol, MlLibEmbedder.TokCol, MlLibEmbedder.TfCol,
        MlLibEmbedder.TfIdfCol, MlLibEmbedder.VecCol)
}

object MlLibEmbedder {
  private val InCol = "__graft_text"
  private val TokCol = "__graft_tokens"
  private val TfCol = "__graft_tf"
  private val TfIdfCol = "__graft_tfidf"
  private val VecCol = "__graft_vec"

  /** Fit the IDF stage on a corpus text column. One pass over the corpus
    * (tokenize + hash are stateless; only IDF aggregates — a single
    * shuffle of at most `dim` counters per partition).
    */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 768): MlLibEmbedder = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(InCol).setOutputCol(TokCol)
        .setPattern("\\W+").setToLowercase(true),
      new HashingTF().setInputCol(TokCol).setOutputCol(TfCol)
        .setNumFeatures(dim),
      new IDF().setInputCol(TfCol).setOutputCol(TfIdfCol),
      new Normalizer().setInputCol(TfIdfCol).setOutputCol(VecCol).setP(2.0)))
    val model = pipeline.fit(
      corpus.withColumn(InCol, coalesce(col(textCol), lit(""))))
    val idf = model.stages(2).asInstanceOf[IDFModel].idf.toArray
    new MlLibEmbedder(dim, idf, model)
  }
}
