package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023,
  * arXiv:2302.03169): score every raw document by how much its hashed
  * token-feature distribution leans toward a target domain, using
  * bucket-count ratio estimates
  *
  *   ratio(b) = p_target(b) / p_raw(b)
  *            = ((c_t(b) + 1) * (N_r + B)) / ((c_r(b) + 1) * (N_t + B))
  *
  * (add-one smoothing on both sides). The paper sums LOG ratios; a log
  * output would drag engine-specific libm ulps into the correctness gate
  * (the q131 lift rule), so the profile reports the same selection signal
  * rationally: per document, the count/fraction of target-leaning tokens
  * (ratio > 1 — the sign of the log term, decided on exact integers) and
  * the min/max ratio, each ONE correctly-rounded IEEE division of two
  * exactly-representable integer products — bit-identical across engines.
  *
  * Scale shape: the bucket tables are B rows BY CONSTRUCTION (hashing is
  * the paper's own move to bound feature space), so they broadcast —
  * scoring is a map-side join over the token stream, and the only
  * corpus-sized shuffle is the per-doc aggregation keyed on `idCol`. The
  * two stream totals fold in as driver literals (the 1-row-aggregate rule:
  * a broadcast cross join of a 1-row frame would plan the BNLJ the plan
  * audit forbids).
  */
object Dsir {

  /** Portable hash bucket in [0, nBuckets): top-32 md5 bits mod B — the
    * engine's cross-engine hash family ([[Sampling.uniformFromId]]).
    */
  def featureBucket(token: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Per-document importance profile of `raw` against the target slice
    * `raw.where(targetPred)`. Tokens are whitespace-split (the corpus
    * battery's tokenizer); every document keeps a row (a doc with no
    * target-leaning token reports n_favored = 0).
    *
    * Output: idCol, n_tokens, n_favored, favored_frac, min_ratio,
    * max_ratio.
    */
  def importanceProfile(raw: DataFrame, targetPred: Column,
                        idCol: String, textCol: String,
                        nBuckets: Int = 512): DataFrame = {
    val toks = split(col(textCol), " ")
    val stream = raw.select(col(idCol), explode(toks).as("w"),
        targetPred.as("__is_t"))
      .withColumn("b", featureBucket(col("w"), nBuckets))
    val bucketCounts = stream.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__is_t"), 1L).otherwise(0L)).as("ct"))
    // stream totals as literals (constant-size driver job, like q131's V)
    val totals = bucketCounts
      .agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt")).head()
    val nR = totals.getLong(0)
    val nT = totals.getLong(1)
    val ratio =
      ((col("ct") + 1L) * lit(nR + nBuckets)).cast("double") /
        ((col("cr") + 1L) * lit(nT + nBuckets)).cast("double")
    val scored = stream
      .join(broadcast(bucketCounts), Seq("b"))
      .withColumn("ratio", ratio)
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("ratio") > 1.0, 1L).otherwise(0L)).as("n_favored"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
      .withColumn("favored_frac",
        col("n_favored").cast("double") / col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("n_favored"),
        col("favored_frac"), col("min_ratio"), col("max_ratio"))
  }
}
