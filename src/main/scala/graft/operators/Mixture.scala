package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixture resampling — the "data mixing" step a training corpus
  * goes through before anything else samples from it: the corpus's
  * NATURAL source proportions are an accident of crawl coverage;
  * training wants TARGET proportions (news-heavy, code-heavy, ...).
  * Given integer relative weights w_s and a total row budget N, each
  * source's quota is k_s = (N·w_s) div Σw and it keeps
  * min(n_s, k_s) rows:
  *   - a source SHORT of its quota keeps everything it has — upsampling
  *     (row repetition / extra epochs) is a deliberate separate decision
  *     the report surfaces (`under_quota`), never silent duplication;
  *   - a source with no listed weight keeps nothing (weight 0) — mixing
  *     is allowlist-shaped on purpose (an unvetted crawl source must
  *     not leak into the mix because someone forgot to name it);
  *   - a listed source absent from the data reports n_in = 0 (the
  *     coverage gap surfaced, like the blocking audit's one-sided
  *     blocks).
  *
  * Membership is the deterministic hash-uniform rank: rows order by
  * (md5-uniform(id, salt), id) within their source and rank ≤ k_s
  * keeps. Growth-stable (new rows in one source never change another
  * source's kept set) and reproducible everywhere — the same
  * house-rules key as [[Sampling.exactSizeSample]].
  *
  * Scale shape: ONE bounded per-source count agg joined back broadcast,
  * one window shuffle partitioned by source — skew bounded by the
  * largest source, the partition profile every per-source op has (a
  * pathological mega-source pre-splits into sub-sources, the q41
  * salting treatment). No global sort; nothing row-sized ever reaches
  * the driver.
  */
object Mixture {

  private def validated(targets: Seq[(String, Long)], budget: Long): Long = {
    require(targets.nonEmpty, "at least one target source weight")
    require(targets.forall(_._2 >= 0), s"negative weight in $targets")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate source in targets")
    require(budget > 0, s"budget must be positive: $budget")
    val sumW = targets.map(_._2).sum
    require(sumW > 0, "at least one positive weight")
    sumW
  }

  /** The mixing plan: per source, rows available (n_in), weight, the
    * budget-share quota, rows that will be kept, and the under-quota
    * flag naming sources that cannot fill their share. Full-outer on
    * (data sources × listed targets), all-integer.
    */
  def quotas(df: DataFrame, sourceCol: String,
             targets: Seq[(String, Long)], budget: Long): DataFrame = {
    val sumW = validated(targets, budget)
    val spark = df.sparkSession
    val t = spark.createDataFrame(targets).toDF(sourceCol, "weight")
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_in"))
    counts.join(t, Seq(sourceCol), "full_outer")
      .select(col(sourceCol),
        coalesce(col("n_in"), lit(0L)).as("n_in"),
        coalesce(col("weight"), lit(0L)).as("weight"))
      .withColumn("quota",
        expr(s"(CAST($budget AS BIGINT) * weight) div CAST($sumW AS BIGINT)"))
      .withColumn("n_keep", least(col("n_in"), col("quota")))
      .withColumn("under_quota", col("n_in") < col("quota"))
  }

  /** The kept rows (original schema). See [[quotas]] for the plan the
    * selection follows.
    */
  def sampleToMixture(df: DataFrame, idCol: String, sourceCol: String,
                      targets: Seq[(String, Long)], budget: Long,
                      salt: String = ":mix"): DataFrame = {
    // plan columns join back under reserved names so an input frame
    // that already carries n_keep/quota/n_in columns cannot collide
    val q = quotas(df, sourceCol, targets, budget)
      .where(col("n_keep") > 0)
      .select(col(sourceCol), col("n_keep").as("__graft_keep"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.uniformFromId(col(idCol), salt).asc, col(idCol).asc)
    df.where(col(sourceCol).isNotNull && col(idCol).isNotNull)
      .join(broadcast(q), Seq(sourceCol))
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") <= col("__graft_keep"))
      .drop("__graft_rn", "__graft_keep")
  }

  /** The UPSAMPLING half [[quotas]]' `under_quota` flag points at,
    * executed deliberately: every listed source is brought to EXACTLY
    * its quota — short sources by whole-corpus epochs plus a
    * deterministic fractional remainder (the standard low-resource
    * repetition recipe: e_s = ⌊k_s/n_s⌋ full epochs, the first
    * k_s mod n_s rows in (uniform, id) rank order get one extra copy),
    * long sources by the same rank-≤ downsample as [[sampleToMixture]].
    * Output rows carry an `epoch` column (1-based copy index) so
    * downstream shuffles can keep copies apart; Σ rows per source = k_s
    * exactly. Map-side explode of a per-row copy count — no joins
    * beyond the broadcast plan, no state.
    */
  def upsampleToQuota(df: DataFrame, idCol: String, sourceCol: String,
                      targets: Seq[(String, Long)], budget: Long,
                      salt: String = ":mix"): DataFrame = {
    val q = quotas(df, sourceCol, targets, budget)
      .where(col("quota") > 0 && col("n_in") > 0)
      .select(col(sourceCol), col("n_in").as("__graft_n"),
        col("quota").as("__graft_q"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.uniformFromId(col(idCol), salt).asc, col(idCol).asc)
    df.where(col(sourceCol).isNotNull && col(idCol).isNotNull)
      .join(broadcast(q), Seq(sourceCol))
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_copies",
        expr("__graft_q div __graft_n") +
          when(col("__graft_rn") <= expr("__graft_q % __graft_n"), 1L)
            .otherwise(0L))
      .where(col("__graft_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(1L), col("__graft_copies"))))
      .drop("__graft_rn", "__graft_copies", "__graft_n", "__graft_q")
  }

  /** Mixing by TOKEN budget instead of row budget — what a training run
    * actually provisions. Per listed source, the token quota is
    * (B·w_s) div Σw; rows order by the same (uniform, id) rank and the
    * greedy prefix whose CUMULATIVE token count stays ≤ quota survives.
    * A row that would cross the quota is dropped along with everything
    * after it (greedy prefix, not best-fit — deterministic and
    * one-pass); a single row larger than its source's whole quota means
    * that source contributes nothing, reported honestly by the caller
    * re-running [[quotas]] on the result. One bounded plan broadcast +
    * one source-partitioned window (rank and running sum share the same
    * window frame — one shuffle, not two).
    */
  def sampleToTokenBudget(df: DataFrame, idCol: String, sourceCol: String,
                          tokenCol: String, targets: Seq[(String, Long)],
                          tokenBudget: Long,
                          salt: String = ":mix"): DataFrame = {
    val sumW = validated(targets, tokenBudget)
    val spark = df.sparkSession
    val t = spark.createDataFrame(targets).toDF(sourceCol, "__graft_w")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.uniformFromId(col(idCol), salt).asc, col(idCol).asc)
    df.where(col(sourceCol).isNotNull && col(idCol).isNotNull &&
        col(tokenCol).isNotNull)
      .join(broadcast(t), Seq(sourceCol))
      .withColumn("__graft_quota",
        expr(s"(CAST($tokenBudget AS BIGINT) * __graft_w) div CAST($sumW AS BIGINT)"))
      .withColumn("__graft_cum",
        sum(col(tokenCol).cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("__graft_cum") <= col("__graft_quota"))
      .drop("__graft_w", "__graft_quota", "__graft_cum")
  }

  /** Temperature-flattened mixture weights — the multilingual-LM mixing
    * rule (sample share ∝ n_s^α with α < 1: head sources flatten, tail
    * sources boost), at the one temperature with a BIT-STABLE integer
    * transcription in any engine: α = 1/2, w_s = ⌊√n_s⌋. IEEE-754
    * requires sqrt to be correctly rounded, so floor∘sqrt over
    * exactly-representable integer doubles lands on the same BIGINT in
    * Spark and in a SQL oracle; a general n^α needs `pow`, which IEEE
    * does NOT pin to a rounding — a caller wanting another α computes
    * its own weights (any rule, its own determinism story) and passes
    * them to [[sampleToMixture]] directly, which is also why this
    * returns the weights rather than hiding them.
    *
    * One bounded per-source count aggregate collects to the driver —
    * the source alphabet is bounded, the same contract under which
    * [[quotas]] broadcasts the plan. Sorted by source name so the
    * returned Seq is deterministic.
    */
  def temperatureTargets(df: DataFrame, sourceCol: String): Seq[(String, Long)] =
    df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> math.sqrt(r.getLong(1).toDouble).toLong)
      .toSeq.sortBy(_._1)

  /** [[sampleToMixture]] under [[temperatureTargets]]' α = 1/2 weights:
    * every source present in the data is listed (temperature mixing
    * reweights the corpus it has — there is no allowlist decision here,
    * that is [[sampleToMixture]] with explicit targets), quotas follow
    * k_s = (N·⌊√n_s⌋) div Σ⌊√n⌋, membership is the same deterministic
    * (uniform, id) rank.
    */
  def sampleToTemperature(df: DataFrame, idCol: String, sourceCol: String,
                          budget: Long, salt: String = ":mix"): DataFrame =
    sampleToMixture(df, idCol, sourceCol,
      temperatureTargets(df, sourceCol), budget, salt)
}
