package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints with a violations report — the
  * validation pass a pipeline runs before trusting an upstream drop
  * (uniqueness of keys, non-null columns, value ranges, referential
  * integrity), in the Deequ/Great-Expectations mold but engine-native.
  *
  * Each rule evaluates as ONE aggregate over its frame: predicate rules
  * are a map-side conditional count; uniqueness is a key-grouped count
  * of over-represented keys; referential integrity is a (broadcast when
  * dim-sized) left-anti join count. The report unions the per-rule
  * 1-row summaries — constant-size output regardless of corpus size.
  */
object Checks {

  sealed trait Rule { def name: String }

  /** Rows where `cond` is false (or null) are violations. */
  final case class Predicate(name: String, cond: Column) extends Rule

  /** Rows carrying a key that occurs more than once are violations. */
  final case class Unique(name: String, keyCols: Seq[String]) extends Rule

  /** Rows whose `keyCol` has no match in `dim(refCol)` are violations
    * (null keys count as violations too: an FK that is null cannot
    * reference anything — callers wanting nullable FKs compose with a
    * Predicate guard instead).
    */
  final case class RefIntegrity(name: String, keyCol: String,
                                dim: DataFrame, refCol: String) extends Rule

  /** Evaluate every rule against `df`; output one row per rule:
    * (rule, n_checked, n_violations, pass).
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val frames = rules.map {
      case Predicate(name, cond) =>
        df.agg(count(lit(1)).as("n_checked"),
            coalesce(sum(when(cond, 0L).otherwise(1L)), lit(0L))
              .as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
      case Unique(name, keyCols) =>
        df.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n")), lit(0L)).as("n_checked"),
            coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
              .as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
      case RefIntegrity(name, keyCol, dim, refCol) =>
        val keys = broadcast(dim.select(col(refCol).as("__ref")).distinct())
        df.join(keys, col(keyCol) === col("__ref"), "left")
          .agg(count(lit(1)).as("n_checked"),
            coalesce(sum(when(col("__ref").isNull, 1L).otherwise(0L)), lit(0L))
              .as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
    }
    frames.reduce(_ unionAll _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
