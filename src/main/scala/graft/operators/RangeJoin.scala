package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop/cartesian plan.
  *
  * Naive `points JOIN intervals ON p BETWEEN lo AND hi` has no equi key, so
  * Spark plans BroadcastNestedLoopJoin — O(|points| × |intervals|) and a
  * broadcast of a whole side. The standard scalable rewrite buckets the
  * domain: each interval is exploded to the buckets it covers, each point
  * maps to exactly one bucket, the join becomes an equi-join on the bucket
  * id, and the residual `BETWEEN` filter removes false positives within the
  * bucket. Cost: shuffle of (intervals × avg-covered-buckets + points) rows
  * — linear, partitionable, AQE/skew-eligible like any equi-join.
  *
  * `bucketWidth` trades replication (wide intervals -> many buckets) against
  * bucket selectivity; pick ~= median interval length.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [loCol, hiCol] contains
    * its `pointCol` (inclusive both ends). Extra equi keys can be prepended
    * via `keyCols` (same name both sides).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_bucket",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / bucketWidth).cast("long"),
        floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    p.join(i, Seq("_bucket") ++ keyCols, "inner")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }
}
