package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — recall@k, reciprocal rank, nDCG@k over a
  * ranked result set against a relevance (qrels) set, computed distributed.
  *
  * A retrieval engine needs its own report card as a first-class operator:
  * the reference tunes its search service by eyeballing notebook result
  * lists (`reference` 02's preview cells); at 100 TB the evaluation itself
  * is a big-data job — |queries| × k ranked rows joined against a qrels
  * relation — so it belongs in the engine, not in a driver loop.
  *
  * Scale shape: ONE equi-join of the ranked rows with the qrels on
  * (query, doc) plus ONE aggregation keyed by query — both shuffles are on
  * the query key, so AQE plans them as a single exchange reuse; nothing is
  * collected. The per-rank relevance flags pivot into k conditional-agg
  * columns (k is a small constant), keeping the whole metric computation
  * inside whole-stage codegen — no HOFs, no UDFs.
  *
  * Float determinism (the bit-exact oracle contract): every emitted double
  * is either a single IEEE division of exact integers (recall, reciprocal
  * rank) or a PINNED left-to-right chain of literal-weight multiply-adds
  * (DCG), divided by an ideal-DCG constant selected from a literal CASE
  * ladder. The DCG weights 1/log2(r+1) come from [[dcgWeights]] —
  * `StrictMath.log` (fdlibm, reproducible across JVMs) — and are embedded
  * as literals on BOTH engines' sides, so no transcendental is ever
  * evaluated inside either engine.
  */
object Eval {

  /** DCG position weights w_r = 1/log2(r+1), r = 1..k. StrictMath (fdlibm)
    * is bit-reproducible everywhere, and the values travel as literals into
    * both the Spark plan and the SQL oracle — the engines only ever
    * multiply/add them.
    */
  def dcgWeights(k: Int): Seq[Double] =
    (1 to k).map(r => StrictMath.log(2.0) / StrictMath.log(r + 1.0))

  /** Ideal-DCG prefix sums idcg(n) = Σ_{r=1..n} w_r, n = 1..k, folded in
    * rank order (the same order the DCG chain uses).
    */
  def idcgPrefix(k: Int): Seq[Double] =
    dcgWeights(k).scanLeft(0.0)(_ + _).tail

  /** Per-query binary-relevance metrics.
    *
    * `ranked`: (qCol, idCol, rankCol) with rank in 1..k (at most one row per
    * (query, rank)); `qrels`: (qCol, idCol) — the relevant set per query.
    * Output: (qCol, recall, rr, ndcg), one row per DISTINCT query in
    * `ranked`:
    *  - recall = |top-k ∩ rel| / |rel|            (0.0 when |rel| = 0)
    *  - rr     = 1 / rank(first relevant hit)      (0.0 when no hit)
    *  - ndcg   = Σ_{hit r} w_r / idcg(min(k,|rel|)) (0.0 when |rel| = 0)
    */
  def rankingMetrics(ranked: DataFrame, qrels: DataFrame,
                     qCol: String, idCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ws = dcgWeights(k)
    val idcg = idcgPrefix(k)

    val rel = qrels.select(col(qCol), col(idCol)).distinct()
      .withColumn("__rel", lit(1L))
    val nRel = rel.groupBy(qCol).agg(count(lit(1)).as("__n_rel"))

    val flagged = ranked.join(rel, Seq(qCol, idCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))

    val relFlagCols = (1 to k).map(r =>
      max(when(col(rankCol) === r, col("__rel")).otherwise(lit(0L)))
        .as(s"__rel_$r"))
    val aggCols =
      sum(col("__rel")).as("__hits") +:
      min(when(col("__rel") === 1L, col(rankCol))).as("__first_hit") +:
      relFlagCols
    val perQ = flagged.groupBy(qCol).agg(aggCols.head, aggCols.tail: _*)

    // pinned left-to-right multiply-add chain; rel flags are 0/1 so each
    // product is exact and the association order is the expression tree's
    val dcg = (1 to k).map(r =>
      lit(ws(r - 1)) * col(s"__rel_$r").cast("double")
    ).reduceLeft[Column](_ + _)

    // ideal DCG at the effective cutoff min(k, n_rel), literal ladder
    val idcgCase = (1 until k).foldLeft(
      when(col("__n_rel") >= k, lit(idcg(k - 1)))) {
      (acc, n) => acc.when(col("__n_rel") === n, lit(idcg(n - 1)))
    }.otherwise(lit(0.0)) // n_rel = 0

    perQ.join(nRel, Seq(qCol), "left")
      .withColumn("__n_rel", coalesce(col("__n_rel"), lit(0L)))
      .select(
        col(qCol),
        when(col("__n_rel") > 0L,
          col("__hits").cast("double") / col("__n_rel").cast("double"))
          .otherwise(lit(0.0)).as("recall"),
        when(col("__first_hit").isNotNull,
          lit(1.0) / col("__first_hit").cast("double"))
          .otherwise(lit(0.0)).as("rr"),
        when(col("__n_rel") > 0L, dcg / idcgCase)
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** Corpus-level (macro) averages of per-query metrics — the headline
    * numbers an IR report actually quotes (mean recall@k, MRR, mean nDCG).
    *
    * A mean of doubles is order-sensitive, so the summation is a pinned
    * TWO-LEVEL fold: per-bucket (query div bucketSize) partial sums folded
    * in query order (each bucket's collected list is bounded by
    * bucketSize — never all queries in one row), then a driver fold over
    * the bucket partials ascending (bounded by nQueries/bucketSize rows).
    * Both levels replay identically in SQL (`list_sum(list(x ORDER BY
    * ...))`), so the means are bit-exact; this is the same two-level
    * scheme the sweep-line global sum uses, applied to metric averaging.
    *
    * Output: one row — (n_queries, mean_<c> for each metric column);
    * all-zero means on an empty input.
    */
  def macroMetrics(perQuery: DataFrame, qCol: String,
                   metricCols: Seq[String],
                   bucketSize: Long = 1024L): DataFrame = {
    require(metricCols.nonEmpty, "macroMetrics needs at least one metric")
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val spark = perQuery.sparkSession
    val aggs =
      count(lit(1)).as("__n") +:
      metricCols.map(c =>
        aggregate(
          sort_array(collect_list(struct(col(qCol), col(c)))),
          lit(0.0), (acc, s) => acc + s.getField(c)).as(s"__p_$c"))
    val parts = perQuery
      .withColumn("__b", expr(s"CAST($qCol AS BIGINT) div $bucketSize"))
      .groupBy(col("__b")).agg(aggs.head, aggs.tail: _*)
      .orderBy(col("__b"))
      .collect()
    val n = parts.map(_.getAs[Long]("__n")).sum
    val means = metricCols.map { c =>
      if (n == 0L) 0.0
      else parts.foldLeft(0.0)((acc, r) =>
        acc + r.getAs[Double](s"__p_$c")) / n.toDouble
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("n_queries",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      metricCols.map(c => org.apache.spark.sql.types.StructField(
        s"mean_$c", org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row.fromSeq(n +: means)),
      schema)
  }
}
