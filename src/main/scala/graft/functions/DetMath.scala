package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine DETERMINISTIC elementary math.
  *
  * Library `ln` is not bit-portable: `Math.log` (JVM intrinsic, ≤1 ulp but
  * not correctly rounded) and DuckDB's libm `ln` were measured to disagree
  * in the last ulp on this corpus's own idf arguments (df=398 at sf0.01:
  * jvm=...276d vs duck=...276c). Since the correctness gate hash-compares
  * doubles BIT-EXACTLY, any score that passes through a transcendental must
  * instead be computed by the SAME pinned sequence of IEEE-754 ops in both
  * engines — `+ - * /` and `sqrt` are correctly rounded by the standard, so
  * an expression built only from them, with the association order pinned,
  * is bit-identical everywhere.
  *
  * `lnDet(x)` for x ≥ 1 (the BM25 idf domain — arg = (N-df+0.5)/(df+0.5)+1
  * is always > 1):
  *   1. range-reduce by powers of two: k = floor(log2 x) via a comparison
  *      ladder (exact), m = x / 2^k ∈ [1, 2) (exact — power-of-two divide),
  *   2. atanh series: t = (m-1)/(m+1) ∈ [0, 1/3),
  *      ln m = 2t · Σ_{j=0..19} t^{2j} / (2j+1)  (Horner, truncation
  *      < (1/3)^41 ≈ 3e-20 — below double ulp of the result),
  *   3. ln x = k·LN2 + ln m, LN2 = the nearest double to ln 2.
  *
  * Accuracy: a few ulps from true ln (the k·LN2 recombination rounds once);
  * the CONTRACT is determinism, not correct rounding — both engines get the
  * same bits, which is what a distributed scoring function actually needs
  * (a re-run, a retry, a different partitioning must not re-rank results).
  *
  * Both forms below — Spark [[withLnDet]] and DuckDB [[lnDetSubquery]] —
  * are generated from the same ladder/coefficient loops so the op sequences
  * cannot drift apart.
  */
object DetMath {

  /** Nearest double to ln 2 (0x3FE62E42FEFA39EF). */
  val Ln2: Double = 0.6931471805599453

  private val MaxK = 48 // ladder covers x < 2^49 — far above any idf arg
  private val Terms = 20 // atanh series terms; truncation < (1/3)^41

  /** Series coefficients 1/(2j+1), j descending for Horner — computed once
    * in Scala; the SQL twin divides the same integers in DuckDB, and IEEE
    * division is correctly rounded in both, so the constants are bit-equal.
    */
  private val hornerDenoms: Seq[Int] = (Terms - 1 to 0 by -1).map(j => 2 * j + 1)

  // ---- driver side ---------------------------------------------------

  /** Plain-Scala lnDet — the SAME op sequence as [[withLnDet]], for
    * serving tiers that must recompute idf on the driver without a Spark
    * job (e.g. [[graft.serve.DeltaPostingsIndex]] re-deriving merged
    * corpus statistics per query). DetMathSpec pins bit-equality to the
    * column form over the idf argument domain. Input must satisfy x ≥ 1.
    */
  def lnDet(x: Double): Double = {
    var k = 0
    var p2 = 1.0
    // the same descending comparison ladder: first j with x >= 2^j wins
    var j = MaxK
    while (k == 0 && j >= 1) {
      if (x >= exactPow2(j)) { k = j; p2 = exactPow2(j) }
      j -= 1
    }
    val m = x / p2
    val t = (m - 1.0) / (m + 1.0)
    val u = t * t
    var s = 1.0 / hornerDenoms.head.toDouble
    hornerDenoms.tail.foreach { d => s = s * u + 1.0 / d.toDouble }
    k.toDouble * Ln2 + 2.0 * t * s
  }

  // ---- Spark side ----------------------------------------------------

  /** Adds `outCol` = lnDet(`xCol`) via staged intermediate columns (keeps
    * each codegen expression small; the ladder CASE appears once, not once
    * per Horner term). Input rows must satisfy x ≥ 1.
    */
  def withLnDet(df: DataFrame, xCol: String, outCol: String): DataFrame = {
    val x = col(xCol)
    val kk = (MaxK to 1 by -1).foldLeft(Option.empty[Column]) { (acc, j) =>
      val c = x >= lit(exactPow2(j))
      Some(acc.fold(when(c, lit(j)))(_.when(c, lit(j))))
    }.get.otherwise(lit(0))
    val p2 = (MaxK to 1 by -1).foldLeft(Option.empty[Column]) { (acc, j) =>
      val c = x >= lit(exactPow2(j))
      Some(acc.fold(when(c, lit(exactPow2(j))))(_.when(c, lit(exactPow2(j)))))
    }.get.otherwise(lit(1.0))
    val t0 = s"__${outCol}_t"
    val u0 = s"__${outCol}_u"
    val k0 = s"__${outCol}_k"
    val m = x / p2
    val stage = df
      .withColumn(k0, kk)
      .withColumn(t0, (m - lit(1.0)) / (m + lit(1.0)))
      .withColumn(u0, col(t0) * col(t0))
    val horner = hornerDenoms.tail.foldLeft(lit(1.0) / lit(hornerDenoms.head.toDouble)) {
      (s, d) => s * col(u0) + lit(1.0) / lit(d.toDouble)
    }
    stage
      .withColumn(outCol,
        col(k0).cast("double") * lit(Ln2) + lit(2.0) * col(t0) * horner)
      .drop(t0, u0, k0)
  }

  // ---- DuckDB side ---------------------------------------------------

  /** A DuckDB subquery string computing `outCol` = lnDet(`xCol`) with the
    * identical op sequence. `src` is a table/subquery exposing `xCol` plus
    * the `keep` columns, which are passed through.
    */
  def lnDetSubquery(src: String, keep: Seq[String], xCol: String, outCol: String): String = {
    val ks = keep.mkString(", ")
    val kp = if (keep.isEmpty) "" else ks + ", "
    val kLadder = (MaxK to 1 by -1)
      .map(j => s"WHEN $xCol >= ${pow2Sql(j)} THEN $j")
      .mkString("CASE ", " ", " ELSE 0 END")
    val pLadder = (MaxK to 1 by -1)
      .map(j => s"WHEN $xCol >= ${pow2Sql(j)} THEN ${pow2Sql(j)}")
      .mkString("CASE ", " ", " ELSE CAST(1 AS DOUBLE) END")
    val horner = hornerDenoms.tail.foldLeft(s"CAST(1 AS DOUBLE) / ${hornerDenoms.head}") {
      (s, d) => s"($s) * __u + CAST(1 AS DOUBLE) / $d"
    }
    s"""(SELECT $kp
       |   CAST(__k AS DOUBLE) * CAST($Ln2 AS DOUBLE)
       |     + CAST(2 AS DOUBLE) * __t * ($horner) AS $outCol
       | FROM (SELECT $kp __k, __t, __t * __t AS __u
       |   FROM (SELECT $kp __k,
       |       ($xCol / __p2 - CAST(1 AS DOUBLE)) / ($xCol / __p2 + CAST(1 AS DOUBLE)) AS __t
       |     FROM (SELECT $kp $xCol, $kLadder AS __k, $pLadder AS __p2
       |       FROM $src))))""".stripMargin
  }

  // ---- deterministic 2^(-f): exponential decay by half-lives ----------

  private val DecayMaxN = 64 // 2^-64 ≈ 5e-20; beyond that the decay IS 0
  private val ExpTerms = 20 // e^r Taylor terms; |r| < ln2 ⇒ trunc < 3e-22

  /** 1/i! for Horner, i descending; 19! < 2^63 so the integer is exact and
    * both engines round it to double identically before the one divide.
    */
  private val expDenoms: Seq[Long] =
    (ExpTerms - 1 to 0 by -1).map(i => (1L to i).foldLeft(1L)(_ * _))

  /** Adds `outCol` = 2^(−`fCol`) for f ≥ 0 — exponential half-life decay
    * (weight = 2^(−age/halfLife)) without `exp`/`pow`, which are as
    * non-portable as `ln`. Split f = n + g (n integer via exact `floor`,
    * g ∈ [0,1)): 2^−n is an exact ladder constant (0 past [[DecayMaxN]]
    * half-lives — both engines agree the weight underflowed), and
    * 2^−g = e^(−g·ln2) by a pinned Taylor–Horner sum. One multiply joins
    * them. Same staged-column scheme as [[withLnDet]].
    */
  def withPow2Decay(df: DataFrame, fCol: String, outCol: String): DataFrame = {
    val f = col(fCol)
    val nD = floor(f).cast("double")
    val ladder = (DecayMaxN to 1 by -1).foldLeft(Option.empty[Column]) {
      (acc, j) =>
        val c = nD >= lit(j.toDouble)
        val v = if (j == DecayMaxN) lit(0.0) else lit(java.lang.Math.scalb(1.0, -j))
        Some(acc.fold(when(c, v))(_.when(c, v)))
    }.get.otherwise(lit(1.0))
    val r0 = s"__${outCol}_r"
    val p0 = s"__${outCol}_p"
    val stage = df
      .withColumn(p0, ladder)
      .withColumn(r0, -((f - nD) * lit(Ln2)))
    val horner = expDenoms.tail.foldLeft(lit(1.0) / lit(expDenoms.head.toDouble)) {
      (s, d) => s * col(r0) + lit(1.0) / lit(d.toDouble)
    }
    stage.withColumn(outCol, col(p0) * horner).drop(r0, p0)
  }

  /** DuckDB twin of [[withPow2Decay]] — identical op sequence. */
  def pow2DecaySubquery(src: String, keep: Seq[String], fCol: String,
                        outCol: String): String = {
    val kp = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    val ladder = (DecayMaxN to 1 by -1).map { j =>
      val v = if (j == DecayMaxN) "CAST(0 AS DOUBLE)"
              else s"CAST(1 AS DOUBLE) / ${1L << j}"
      s"WHEN __n >= CAST($j AS DOUBLE) THEN $v"
    }.mkString("CASE ", " ", " ELSE CAST(1 AS DOUBLE) END")
    val horner = expDenoms.tail.foldLeft(s"CAST(1 AS DOUBLE) / ${expDenoms.head}") {
      (s, d) => s"($s) * __r + CAST(1 AS DOUBLE) / $d"
    }
    s"""(SELECT $kp __p * ($horner) AS $outCol
       | FROM (SELECT $kp $ladder AS __p,
       |     -(($fCol - __n) * CAST($Ln2 AS DOUBLE)) AS __r
       |   FROM (SELECT $kp $fCol, floor($fCol) AS __n FROM $src)))""".stripMargin
  }

  /** 2^j as an exact double (j ≤ 48 ≪ 53 bits — always exact). */
  private def exactPow2(j: Int): Double = java.lang.Math.scalb(1.0, j)

  /** 2^j as exact SQL text: an integer literal, used in double context
    * (BIGINT→DOUBLE cast of a power of two below 2^53 is exact).
    */
  private def pow2Sql(j: Int): String = s"CAST(${1L << j} AS DOUBLE)"
}
