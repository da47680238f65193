package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-tailed
  * (the "one hot user drowns one reducer" failure mode at 100 TB).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * [[saltedJoin]] is the explicit form for when the skew is known up front:
  * the build side is replicated `salt` ways, the probe side scatters each hot
  * key uniformly over the `salt` replicas, so the join's shuffle spreads a
  * hot key over `salt` reducers instead of one.
  */
object Skew {

  /** Inner equi-join `left.key = right.key` with `salt`-way key salting.
    * `right` (the smaller/replicated side) is exploded `salt` times; `left`
    * rows pick a deterministic pseudo-random replica (hash of all columns),
    * keeping results exactly equal to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    require(salt > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** The DIAGNOSIS side of [[saltedJoin]]: which keys are heavy, and how
    * heavy — the report a pipeline runs on a join key before deciding to
    * salt (or before blaming the cluster). Per top-`k` key: row count,
    * share of all rows, and the ratio to a perfectly uniform key
    * (count × distinct-keys / total — the "this key is N× a fair share"
    * number; > shuffle-partition count means one reducer saturates).
    * All-rational arithmetic (two exact-integer products per ratio).
    *
    * ONE key-grouped count (map-side combined) feeds both the top-k heap
    * (TakeOrderedAndProject) and the 1-row totals, which fold back as a
    * broadcast-free literal pair via a driver fetch — constant-size
    * output, no global sort, no second scan of the data.
    */
  def keyReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0)
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // counts feed totals AND top-k: one computation
    val tot = counts.agg(coalesce(sum(col("n")), lit(0L)), count(lit(1))).head()
    val (total, nKeys) = (tot.getLong(0), tot.getLong(1))
    counts.orderBy(col("n").desc, col(keyCol)).limit(k)
      .withColumn("frac", col("n").cast("double") / total)
      .withColumn("x_fair_share",
        (col("n") * nKeys).cast("double") / total)
  }
}
