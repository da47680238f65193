package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the model-based upgrade of
  * [[graft.operators.TextAnalysis.qualityScore]]'s fixed-weight heuristic:
  * the standard pretraining-curation move (a small linear classifier over
  * cheap text features, fit on a curated seed set or weak labels, then run
  * over the whole corpus to rank/filter documents).
  *
  * Like [[graft.embed.MlLibEmbedder]] (the other fitted-model surface),
  * outputs are model-relative by design — there is no closed-form SQL twin
  * for LBFGS coefficients, so verification is spec-based (separation on
  * planted good/bad docs, save/load parity, refit determinism), per the
  * same rule SURVEY §7.4.1 applies to the embedder.
  *
  * Scale shape: featurization is one map-side pass (the fused
  * [[graft.functions.TextStats]] byte scan plus in-row array math — no
  * shuffle, no UDF); fitting is MLlib's bounded-iteration treeAggregate
  * over 7 doubles/row (gradient state is O(features), never O(rows));
  * scoring broadcasts the fitted model and stays inside the corpus scan
  * stage. Fit on a sample, score 100 TB — the intended deployment.
  */
object QualityClassifier {

  val FeatureCols: Seq[String] = Seq("f_chars", "f_tokens", "f_avg_tok",
    "f_punct_ratio", "f_digit_ratio", "f_stop_ratio", "f_distinct_ratio")

  private val FeatCol = "__q_features"

  /** Adds the 7 feature columns (doubles, never null — null text maps to
    * the empty document). Exposed so callers can inspect/persist features.
    */
  def featurize(df: DataFrame, textCol: String): DataFrame = {
    val safe = coalesce(col(textCol), lit(""))
    val m = graft.operators.TextAnalysis.qualityMetrics(safe)
    val words = split(safe, " ")
    val nChars = greatest(m.getField("n_chars").cast("double"), lit(1.0))
    val nToks = greatest(m.getField("n_tokens").cast("double"), lit(1.0))
    df.withColumn("f_chars", m.getField("n_chars").cast("double"))
      .withColumn("f_tokens", m.getField("n_tokens").cast("double"))
      .withColumn("f_avg_tok", m.getField("avg_token_len"))
      .withColumn("f_punct_ratio", m.getField("n_punct").cast("double") / nChars)
      .withColumn("f_digit_ratio", m.getField("n_digits").cast("double") / nChars)
      .withColumn("f_stop_ratio", m.getField("n_stopwords").cast("double") / nToks)
      .withColumn("f_distinct_ratio",
        size(array_distinct(words)).cast("double") / nToks)
  }

  /** Fits assembler + logistic regression on `df` with 0/1 labels in
    * `labelCol`. Standardized L2-regularized LBFGS — deterministic for a
    * fixed input partitioning (spec-pinned).
    */
  def fit(df: DataFrame, textCol: String, labelCol: String,
          maxIter: Int = 50, regParam: Double = 0.01): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol(FeatCol)
    val lr = new LogisticRegression()
      .setFeaturesCol(FeatCol).setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(assembler, lr)).fit(featurize(df, textCol))
  }

  /** Scores `df`: adds `quality_prob` (P(label=1)) and `quality_pred`
    * (0/1), dropping the ML intermediates. Map-side only.
    */
  def score(model: PipelineModel, df: DataFrame, textCol: String): DataFrame =
    model.transform(featurize(df, textCol))
      .withColumn("quality_prob",
        element_at(vector_to_array(col("probability")), 2))
      .withColumn("quality_pred", col("prediction").cast("int"))
      .drop(FeatCol, "rawPrediction", "probability", "prediction")
      .drop(FeatureCols: _*)
}
