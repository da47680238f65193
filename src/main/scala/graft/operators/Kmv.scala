package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k theta) distinct sketch — the
  * SET-OPERATION member of the sketch family: mergeable like HLL
  * ([[Hll]]), but two sketches also estimate their UNION, INTERSECTION,
  * and JACCARD (Beyer et al., SIGMOD'07; the Theta-sketch idea) — the
  * question HLL structurally cannot answer, and the one a corpus curator
  * asks constantly ("how much do these two sources overlap?") without
  * being able to afford the pairwise exact join at 100 TB.
  *
  * Sketch: the k smallest DISTINCT 60-bit portable hashes ([[Hll.hash60]]
  * — same md5-prefix hash, so the two sketch families share one hash
  * convention). Estimators, for a merged pair sketch of the k smallest
  * union values with ntot = |distinct union of the two sketches|:
  *  - ntot < k ⇒ the sketches held their whole sets: union estimate =
  *    ntot EXACTLY;
  *  - else θ = kth/2^60 and est_union = (k−1)/θ;
  *  - est_jaccard = ρ/k where ρ = |union-sketch values present in BOTH
  *    input sketches| (each union value is a uniform sample of A∪B).
  *
  * Shapes: the per-group sketch is a bounded min-k heap `Aggregator` —
  * map-side partial heaps, O(k) shuffled per partition per group, the
  * value stream never shuffles (the [[Ann.TopKAgg]] discipline, min-k
  * with set semantics). Pair arithmetic runs on the driver over the
  * collected sketch table — groups × k longs, bounded by design. All
  * estimate arithmetic is integer counts + pinned IEEE divisions, so the
  * numbers are bit-stable across engines.
  */
object Kmv {

  /** Sorted-ascending distinct min-k buffer. */
  case class Buf(xs: Seq[Long])

  class MinKAgg(k: Int) extends Aggregator[Long, Buf, Seq[Long]] {
    private def insert(xs: Seq[Long], v: Long): Seq[Long] = {
      if (xs.length == k && v >= xs.last) xs
      else {
        val i = xs.search(v)(Ordering.Long) match {
          case scala.collection.Searching.Found(_) => return xs // distinct
          case scala.collection.Searching.InsertionPoint(p) => p
        }
        val grown = (xs.take(i) :+ v) ++ xs.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }
    def zero: Buf = Buf(Vector.empty)
    def reduce(b: Buf, v: Long): Buf = Buf(insert(b.xs, v))
    def merge(a: Buf, b: Buf): Buf = Buf(b.xs.foldLeft(a.xs)(insert))
    def finish(b: Buf): Seq[Long] = b.xs
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group sketch table: (groupCols..., kmv array<long> sorted asc). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
             k: Int): DataFrame = {
    val agg = udaf(new MinKAgg(k), Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(Hll.hash60(valueCol)).as("kmv"))
  }

  /** Driver-side pair estimates from two sorted sketches. Returns
    * (ntot, estUnion, estJaccard).
    */
  private[graft] def pairEstimate(a: Seq[Long], b: Seq[Long],
                                  k: Int): (Long, Double, Double) = {
    val union = (a ++ b).distinct.sorted
    val ntot = union.length.toLong
    if (ntot < k) {
      val sa = a.toSet; val sb = b.toSet
      val rho = union.count(v => sa.contains(v) && sb.contains(v))
      // exact regime: the sketches held their whole sets
      (ntot, ntot.toDouble,
        if (ntot == 0) 0.0 else rho.toDouble / ntot.toDouble)
    } else {
      val uk = union.take(k)
      val kth = uk.last
      val theta = kth.toDouble / java.lang.Math.scalb(1.0, 60)
      val estU = (k - 1).toDouble / theta
      val sa = a.toSet; val sb = b.toSet
      val rho = uk.count(v => sa.contains(v) && sb.contains(v))
      (ntot, estU, rho.toDouble / k.toDouble)
    }
  }

  /** All-pairs (groupA < groupB) estimate table from a [[sketch]] result
    * keyed by ONE string group column. Bounded by groups² rows.
    */
  def pairEstimates(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val rows = sketches.select(col(groupCol), col("kmv")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toVector).sortBy(_._1)
    val out = for {
      i <- rows.indices
      j <- (i + 1) until rows.length
    } yield {
      val (ga, a) = rows(i); val (gb, b) = rows(j)
      val (ntot, estU, estJ) = pairEstimate(a, b, k)
      (ga, gb, ntot, estU, estJ)
    }
    out.toSeq.toDF(groupCol + "_a", groupCol + "_b", "n_merged",
      "est_union", "est_jaccard")
  }
}
