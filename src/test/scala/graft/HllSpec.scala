package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** HLL sketch: the rho ladder on engineered bit patterns, estimator
  * accuracy in its n >> m regime, and the determinism/duplication
  * invariants that make it a sketch rather than a sample.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("rho ladder: exact leading-zero ranks on engineered patterns") {
    // w occupies the low 54 bits; rho = leading zeros within that field + 1
    val cases = Seq(
      (1L << 53) -> 1,          // top bit of the field set
      (1L << 52) -> 2,
      (3L << 52) -> 1,          // rho sees the HIGHEST set bit
      1L -> 54,                 // only the lowest bit
      0L -> 55                  // empty field: all-zeros convention
    )
    val got = cases.map(_._1).toDF("w")
      .select(Hll.rho(col("w")).as("r")).collect().map(_.getInt(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("estimate lands within 3 sigma in the n >> m regime, and is deterministic") {
    val n = 20000
    val df = (1 to n).map(i => s"value_$i").toDF("v")
    val out = Hll.distinctEstimate(df.withColumn("g", lit("all")), Seq("g"), col("v"))
      .collect().head
    val exact = out.getAs[Long]("n_exact")
    val est = out.getAs[Double]("hll_est")
    assert(exact == n)
    // sigma = 1.04/sqrt(64) ~ 13%; 3 sigma = 39%
    assert(est > n * 0.61 && est < n * 1.39, s"estimate $est vs $n")
    // repartitioning must not move a single bit (max-merge is order-free)
    val again = Hll.distinctEstimate(
      df.repartition(17).withColumn("g", lit("all")), Seq("g"), col("v"))
      .collect().head.getAs[Double]("hll_est")
    assert(again == est)
  }

  test("duplicates never change the estimate (cardinality, not frequency)") {
    val base = (1 to 5000).map(i => s"tok$i").toDF("v").withColumn("g", lit("x"))
    val est1 = Hll.distinctEstimate(base, Seq("g"), col("v"))
      .collect().head.getAs[Double]("hll_est")
    val dup = base.union(base).union(base)
    val est3 = Hll.distinctEstimate(dup, Seq("g"), col("v"))
      .collect().head.getAs[Double]("hll_est")
    assert(est1 == est3)
  }

  test("registers max-merge: sharded partials finish to the whole's estimate") {
    val df = (1 to 8000).map(i => ("g", s"item$i")).toDF("g", "v")
    val whole = Hll.estimateFromRegisters(
      Hll.registers(df, Seq("g"), col("v")), Seq("g"))
      .collect().head.getDouble(1)
    val a = Hll.registers(df.where(length(col("v")) % 2 === 0), Seq("g"), col("v"))
    val b = Hll.registers(df.where(length(col("v")) % 2 === 1), Seq("g"), col("v"))
    val merged = a.union(b).groupBy("g", "bucket")
      .agg(max(col("reg")).as("reg"))
    val got = Hll.estimateFromRegisters(merged, Seq("g"))
      .collect().head.getDouble(1)
    assert(got == whole, s"merged $got != whole $whole")
  }

  test("groups sketch independently") {
    val df = ((1 to 1000).map(i => ("a", s"v$i")) ++
      (1 to 300).map(i => ("b", s"v$i"))).toDF("g", "v")
    val out = Hll.distinctEstimate(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("a")._1 == 1000 && out("b")._1 == 300)
    assert(out("a")._2 > out("b")._2,
      s"bigger group must estimate bigger: ${out}")
  }
}
