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

  /** Market-basket association rules: directional `antecedent ⇒
    * consequent` with support and confidence thresholds — [[lift]]
    * measures symmetric surprise; rules add DIRECTION (conf(a⇒b) =
    * n_ab/n_a ≠ conf(b⇒a)) and the support floor that makes the result
    * actionable (recommendations, co-crawl scheduling, query
    * suggestion).
    *
    * Scale = the Apriori pruning pushed INTO the plan: a pair cannot
    * clear `minSupport` unless both items do, so the frequent-item set
    * (a bounded aggregate) broadcast-semi-joins onto the occurrence
    * relation BEFORE the container self-join — rare labels (the long
    * tail, most of the vocabulary) never reach pair generation. Pair
    * volume is then C(frequent-per-container, 2), not
    * C(labels-per-container, 2).
    *
    * `minConfidence` is the exact rational confP/confQ, enforced by
    * integer cross-multiplication (`n_ab * confQ >= confP * n_a`) — no
    * float threshold crossing. The reported confidence and lift are each
    * ONE correctly-rounded division of exact integer products, both
    * engines identical.
    */
  def associationRules(df: DataFrame, containerCol: String, labelCol: String,
                       minSupport: Long, confP: Long, confQ: Long): DataFrame = {
    require(confQ > 0 && confP >= 0, s"confidence $confP/$confQ must be a nonnegative rational")
    val occ = df.select(col(containerCol).as("c"), col(labelCol).as("l"))
      .where(col("c").isNotNull && col("l").isNotNull)
      .distinct()
    val totals = occ.groupBy(col("l")).agg(count(lit(1)).as("n"))
    val frequent = totals.where(col("n") >= minSupport)
    val nTotal = occ.select(countDistinct(col("c"))).head.getLong(0)
    val focc = occ.join(broadcast(frequent.select(col("l"))), Seq("l"), "leftsemi")
    val pairs = focc.select(col("c"), col("l").as("la"))
      .join(focc.select(col("c").as("c2"), col("l").as("lb")),
        col("c") === col("c2") && col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    // each surviving pair emits both directions — ONE explode over a
    // 2-struct array, not a union of two projections: union branches are
    // separate physical subtrees, so the container self-join (the costly
    // stage) would execute twice. Same rows, one execution.
    val directed = pairs
      .select(explode(array(
        struct(col("la").as("antecedent"), col("lb").as("consequent"),
          col("n_ab")),
        struct(col("lb").as("antecedent"), col("la").as("consequent"),
          col("n_ab")))).as("__d"))
      .select(col("__d.antecedent").as("antecedent"),
        col("__d.consequent").as("consequent"), col("__d.n_ab").as("n_ab"))
    directed
      .join(broadcast(frequent.select(col("l").as("antecedent"), col("n").as("n_ant"))),
        Seq("antecedent"))
      .join(broadcast(frequent.select(col("l").as("consequent"), col("n").as("n_cons"))),
        Seq("consequent"))
      .where(col("n_ab") * confQ >= lit(confP) * col("n_ant"))
      .select(col("antecedent"), col("consequent"),
        col("n_ant"), col("n_cons"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_ant").cast("double")).as("confidence"),
        (col("n_ab").cast("double") * lit(nTotal.toDouble) /
          (col("n_ant").cast("double") * col("n_cons").cast("double"))).as("lift"))
  }
}
