package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins merge (upsert) — the UPDATE half of the reference's cache
  * maintenance story: the write-back loop inserts new rows and refreshes
  * existing ones keyed on the query text
  * (`/root/reference/02_method2_manual_vector_embedding.sql:415-418`);
  * [[Dedup.exactDedup]] (q50) covers the insert-dedup half, this operator
  * covers "a newer version of an existing key replaces the old row" — the
  * SCD-1 merge every incremental corpus refresh needs.
  *
  * Shape: ONE hash aggregation — `max_by(payload, (version, priority))` with
  * map-side partial merge — NOT a per-key window sort. At 100 TB the
  * difference is decisive: the agg shuffles one candidate row per (key,
  * partition) and never sorts, while `row_number() OVER (PARTITION BY key
  * ORDER BY version DESC)` shuffles every row and sorts every group. The
  * DuckDB oracle keeps the window form, so the gate verifies the
  * equivalence on real data (the q64/q67 pattern: scale-shaped engine,
  * rank-shaped oracle).
  *
  * Determinism contract: callers must make `(version, priority)` unique per
  * key — e.g. priority 0 for the base corpus, 1 for the update batch, with
  * at most one update row per key. `max_by` on a tied ordering key is
  * nondeterministic by Spark contract (and `arg_max` by DuckDB's), so the
  * operator requires the caller to break ties structurally rather than
  * silently picking a winner.
  */
object Upsert {

  /** Merge `base` and `updates` (same schema), keeping for every key the row
    * with the greatest `(versionCol, prioCol)`. Output columns = input
    * columns minus `prioCol` (the tiebreak is merge plumbing, not payload).
    */
  def latestWins(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                 versionCol: String, prioCol: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val all = base.unionByName(updates)
    val payloadCols = all.columns.filterNot(keyCols.contains).toSeq
    val winner = max_by(
      struct(payloadCols.map(col): _*),
      struct(col(versionCol), col(prioCol)))
    val outPayload = payloadCols.filterNot(_ == prioCol)
    all.groupBy(keyCols.map(col): _*)
      .agg(winner.as("_w"))
      .select(keyCols.map(col) ++ outPayload.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Snapshot diff — the INVERSE of the merge family: given two versions
    * of a table, emit the change feed that turns `old` into `current`
    * (added / removed / changed keys, with the changed column names).
    * This is how an incremental pipeline discovers what an upstream
    * full-refresh actually touched (and the audit trail for a cache
    * refresh: the reference's write-back loop rewrites wholesale; the
    * diff says what moved).
    *
    * ONE full-outer shuffle join on the key; per-column comparison is a
    * null-safe codegen projection on the joined row. `changed_cols` is a
    * deterministic comma-joined list in declared column order.
    */
  def snapshotDiff(old: DataFrame, current: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(old.columns.sameElements(current.columns),
      s"schema mismatch: ${old.columns.mkString(",")} vs ${current.columns.mkString(",")}")
    val payloadCols = old.columns.filterNot(keyCols.contains).toSeq
    val o = old.select(old.columns.map(c => col(c).as(s"__o_$c")): _*)
    val n = current.select(current.columns.map(c => col(c).as(s"__n_$c")): _*)
    val cond = keyCols.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)
    val oKey = col(s"__o_${keyCols.head}")
    val nKey = col(s"__n_${keyCols.head}")
    val changedCols = concat_ws(",", payloadCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(oKey.isNull, lit("added"))
          .when(nKey.isNull, lit("removed"))
          .when(changedCols =!= "", lit("changed")))
      .where(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", changedCols))
      .select(keyCols.map(c =>
          coalesce(col(s"__o_$c"), col(s"__n_$c")).as(c)) ++
        Seq(col("change"), col("changed_cols")): _*)
  }

  /** CDC change-log apply — the DELETE-aware sibling of [[latestWins]]: a
    * log of (I)nsert / (U)pdate / (D)elete operations collapses to final
    * table state by keeping each key's greatest-`versionCol` operation and
    * dropping keys whose last operation is a delete. This is the missing
    * third verb of the merge family (latestWins can only ever keep a row).
    *
    * Same ONE-hash-agg shape as [[latestWins]] (`max_by` with map-side
    * partials, no per-key window sort) — the delete filter runs on the
    * k-row winner set, not the log. Same determinism contract: caller
    * makes `versionCol` unique per key.
    */
  def applyChangeLog(changes: DataFrame, keyCols: Seq[String],
                     versionCol: String, opCol: String): DataFrame = {
    val payloadCols = changes.columns.filterNot(keyCols.contains).toSeq
    val winner = max_by(struct(payloadCols.map(col): _*), col(versionCol))
    changes.groupBy(keyCols.map(col): _*)
      .agg(winner.as("_w"))
      .where(col(s"_w.$opCol") =!= "D")
      .select(keyCols.map(col) ++
        payloadCols.filterNot(_ == opCol).map(c => col(s"_w.$c").as(c)): _*)
  }

  /** SCD-2 companion to [[latestWins]]'s SCD-1: keep EVERY version, each
    * stamped with its validity interval — `valid_from` = the change's own
    * timestamp, `valid_to` = the NEXT change's timestamp for the same key
    * (null = still current). The "as the data looked on date X" axis an
    * incremental corpus needs for reproducible training snapshots;
    * point-in-time reads then compose with [[AsOf]] joins.
    *
    * One window `lead` per key — the partition is a key's CHANGE HISTORY
    * (versions per key, bounded by churn), never the corpus, so the
    * per-key sort stays small at any corpus size (the q33 sessionize
    * argument). `orderCols` must make the per-key order total (e.g.
    * ts + change id) — ties would make `lead` nondeterministic by the
    * same contract [[latestWins]] documents for `max_by`.
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
