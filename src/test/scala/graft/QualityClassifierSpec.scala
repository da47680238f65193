package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier

/** Model-relative verification for the trained quality classifier (the
  * same regime as MlLibEmbedderSpec: no SQL twin exists for LBFGS
  * coefficients, so the contract is separation, determinism, and
  * persistence parity).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // clearly separable planted corpus: good = longer varied prose-ish text
  // with stopwords; bad = tiny fragments or one-token spam
  private def good(i: Int) =
    s"the quick brown fox $i jumps over the lazy dog and then walks on " +
      s"to find some other interesting words in the long meadow $i"
  private def bad(i: Int) =
    if (i % 2 == 0) s"x$i" else Array.fill(12)(s"spam$i").mkString(" ")

  private lazy val train = (
    (0 until 20).map(i => (good(i), 1.0)) ++
      (0 until 20).map(i => (bad(i), 0.0))
  ).toDF("text", "label")

  private lazy val holdout = (
    (100 until 110).map(i => (good(i), 1.0)) ++
      (100 until 110).map(i => (bad(i), 0.0))
  ).toDF("text", "label")

  private lazy val model = QualityClassifier.fit(train, "text", "label")

  test("separates planted good/bad docs on a holdout set") {
    val scored = QualityClassifier.score(model, holdout, "text")
    val wrong = scored.where(col("quality_pred") =!= col("label").cast("int")).count()
    assert(wrong == 0, s"misclassified $wrong of 20 holdout docs")
    // probabilities must actually separate, not sit at the boundary
    val pGood = scored.where(col("label") === 1.0).agg(min("quality_prob")).head().getDouble(0)
    val pBad = scored.where(col("label") === 0.0).agg(max("quality_prob")).head().getDouble(0)
    assert(pGood > 0.6 && pBad < 0.4, s"weak separation: minGood=$pGood maxBad=$pBad")
  }

  test("null/empty text scores as a document, not an error") {
    val df = Seq(Tuple1(null.asInstanceOf[String]), Tuple1(""), Tuple1("ok text"))
      .toDF("text")
    val scored = QualityClassifier.score(model, df, "text")
    assert(scored.count() == 3)
    assert(scored.where(col("quality_prob").isNull).count() == 0)
  }

  test("refit on the same input is deterministic") {
    val m2 = QualityClassifier.fit(train, "text", "label")
    val a = QualityClassifier.score(model, holdout, "text")
      .select("text", "quality_prob").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = QualityClassifier.score(m2, holdout, "text")
      .select("text", "quality_prob").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("save/load roundtrip serves identical scores") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qc").toString
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = QualityClassifier.score(model, holdout, "text")
      .select("text", "quality_prob").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = QualityClassifier.score(loaded, holdout, "text")
      .select("text", "quality_prob").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("weak-label bootstrap: labels from the heuristic score are recoverable") {
    // label docs by the fixed-weight heuristic, fit, and check the model
    // reproduces the heuristic's decisions on unseen docs — the classifier
    // can bootstrap from its predecessor without hand labels
    import graft.operators.TextAnalysis
    def lab(df: org.apache.spark.sql.DataFrame) = df.withColumn("label",
      (TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))) > 0.55)
        .cast("double"))
    val trainW = lab((0 until 30).map(i => (i.toLong, if (i % 3 == 0) bad(i) else good(i))).toDF("id", "text"))
    val holdW = lab((200 until 220).map(i => (i.toLong, if (i % 3 == 0) bad(i) else good(i))).toDF("id", "text"))
    // both label classes must be present for the fit to be meaningful
    assert(trainW.select(countDistinct("label")).head().getLong(0) == 2)
    val m = QualityClassifier.fit(trainW, "text", "label")
    val wrong = QualityClassifier.score(m, holdW, "text")
      .where(col("quality_pred") =!= col("label").cast("int")).count()
    assert(wrong == 0, s"weak-label model disagreed on $wrong of 20 unseen docs")
  }
}
