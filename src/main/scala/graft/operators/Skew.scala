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
}
