package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence lift between categorical labels sharing a container
  * (event types within a user, tags within a document, sources within a
  * near-dup cluster): for each label pair, how much more often they
  * co-occur than their individual popularity predicts —
  * `lift = n_ab * N / (n_a * n_b)`, the PMI exponential. Lift ORDERS
  * identically to PMI while staying a single division of exact integer
  * counts — no `log`, so the result is bit-reproducible across engines
  * (log/libm rounding differs; the q77 tf-idf argument).
  *
  * Scale shape: distinct (container, label) first — one shuffle that also
  * collapses repeat occurrences; per-container pairs via a self-join on
  * the container key, bounded by the per-container DISTINCT label count
  * (labels are classes — event types, tags — so C(labels,2) per
  * container is small by construction, never corpus²); label totals are
  * a bounded aggregate broadcast back onto the pair counts.
  */
object Cooccur {

  /** One row per unordered label pair (a < b) that co-occurs at least
    * once: `(label_a, label_b, n_a, n_b, n_ab, lift)` where `n_x` counts
    * CONTAINERS holding x and `N` is the total container count.
    */
  def lift(df: DataFrame, containerCol: String, labelCol: String): DataFrame = {
    val occ = df.select(col(containerCol).as("c"), col(labelCol).as("l"))
      .where(col("c").isNotNull && col("l").isNotNull)
      .distinct()
    // occ has four consumers, but they all sit above the SAME distinct
    // exchange — ReuseExchange computes it once (the q77 lesson)
    val totals = occ.groupBy(col("l")).agg(count(lit(1)).as("n"))
    // one bounded scalar on the driver (a count, like the stored query
    // vectors) — a 1-row broadcast cross join would plan a BNLJ for no gain
    val nTotal = occ.select(countDistinct(col("c"))).head.getLong(0)
    val pairs = occ.toDF("c", "la")
      .join(occ.toDF("c2", "lb"), col("c") === col("c2") && col("la") < col("lb"))
      .groupBy(col("la").as("label_a"), col("lb").as("label_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(totals.select(col("l").as("la2"), col("n").as("n_a"))),
        col("label_a") === col("la2"))
      .join(broadcast(totals.select(col("l").as("lb2"), col("n").as("n_b"))),
        col("label_b") === col("lb2"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"), col("n_ab"),
        (col("n_ab").cast("double") * lit(nTotal.toDouble) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }
}
