package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, PolyHash, SimHash60, TextStats}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so any session built with
  * `.config("spark.sql.extensions", "graft.api.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) can call them from SQL:
  *
  * {{{
  *   SELECT id, cosine_similarity(embedding, array(...)) AS score ...
  *   SELECT simhash60(split(text, ' ')), minhash_signature(split(text, ' '), 16) ...
  * }}}
  *
  * The same registrations are available imperatively via
  * `VectorFunctions.registerAll` / `TextHashFunctions.registerAll` for
  * sessions created without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: rewrite SQL cosine top-k over an AnnIndexMeta-carrying
    // parquet layout into a partition-pruned IVF probe (opt-in via
    // spark.graft.ann.autoProbe; see graft.plans.IvfProbeRule)
    ext.injectOptimizerRule(graft.plans.IvfProbeRule)
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "60-bit SimHash of an array<string> of tokens"),
      (es: Seq[Expression]) => SimHash60(es.head)))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "polynomial rolling hash of a string"),
      (es: Seq[Expression]) => PolyHash(es.head)))
    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats",
        "single-pass struct(n_chars, n_spaces, n_punct, n_digits, n_upper) of a string"),
      (es: Seq[Expression]) => TextStats(es.head)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "MinHash signature of an array<string>; second arg = num hashes"),
      (es: Seq[Expression]) => es(1) match {
        case e if e.foldable =>
          MinHashSignature(es.head, e.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_signature: numHashes must be a literal")
      }))
    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted",
        "jaccard similarity of two sorted distinct array<bigint> sets"),
      (es: Seq[Expression]) => es match {
        case Seq(a, b) => graft.functions.JaccardSorted(a, b)
        case _ => throw new IllegalArgumentException(
          s"jaccard_sorted takes exactly 2 arguments, got ${es.length}")
      }))
  }
}
