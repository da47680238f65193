package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document salient-term extraction — the "what is this document
  * about" primitive a curation pipeline uses for topic bucketing and
  * mixture reporting.
  *
  * Score is tf/df: term frequency inside the document over corpus document
  * frequency — the monotone core of tf-idf without the transcendental
  * log(N/df) (whose libm rounding is engine-specific; the RANKING under
  * tf/df with a fixed tie-break is what the operator contracts, and the
  * ratio of two exact counts is a bit-portable double).
  *
  * Shape at 100 TB: one shuffle to (doc, term) for tf with map-side
  * combine; document frequency aggregates FROM the tf frame (ReuseExchange
  * shares the (doc, term) exchange) and broadcasts — vocabulary grows
  * sublinearly with corpus size (a few M terms ≈ tens of MB). The final
  * per-doc top-k window partitions by doc_id — millions of tiny sorted
  * groups, never a single hot task.
  */
object Keywords {

  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val terms = df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // df COUNTS ROWS of tf, but phrased over the tf column: a plain
    // count(1) lets column pruning drop tf's count from this branch, the
    // subtrees diverge, and ReuseExchange stops sharing the (doc, term)
    // exchange — the corpus would be scanned and shuffled TWICE (same
    // measured trap as Boilerplate's deliberately-kept countDistinct).
    // tf >= 1 always, so this is exactly count(*).
    val docFreq = tf.groupBy("term")
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    val scored = tf.join(broadcast(docFreq), "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }
}
