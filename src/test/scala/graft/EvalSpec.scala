package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

/** Pins the IR-metrics operator to hand-computed values, the weight/IDCG
  * constants to their defining identities, and the edge rows (no relevant
  * docs, no hits) to the documented 0.0 conventions.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("dcgWeights: w_1 = 1 exactly, strictly decreasing, 1/log2(r+1)") {
    val ws = Eval.dcgWeights(10)
    assert(ws.head == 1.0) // log2(2) = 1: StrictMath.log(2)/StrictMath.log(2)
    assert(ws.sliding(2).forall { case Seq(a, b) => a > b })
    // w_3 = ln2/ln4 = 0.5 exactly in fdlibm (ln4 = 2*ln2 is not guaranteed
    // exact in general, so compare against the defining expression instead)
    assert(ws(2) == StrictMath.log(2.0) / StrictMath.log(4.0))
  }

  test("idcgPrefix: running in-order sums of the weights") {
    val ws = Eval.dcgWeights(5)
    val ps = Eval.idcgPrefix(5)
    assert(ps.head == ws.head)
    assert(ps(2) == ws.head + ws(1) + ws(2)) // left-assoc fold
    assert(ps.size == 5)
  }

  test("rankingMetrics: hand-computed recall/rr/ndcg, zero-rel and no-hit edges") {
    val k = 3
    val ws = Eval.dcgWeights(k)
    // q1: rel docs {10, 11, 12, 13} (4 rels), retrieved ranks: 1->10(hit),
    //     2->99(miss), 3->11(hit) => recall 2/4, rr 1/1, dcg w1+w3, idcg(3)
    // q2: rel docs {20}, retrieved all misses => recall 0, rr 0, ndcg 0
    // q3: NO rel docs at all => all 0.0 (not null, not NaN)
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 30L, 1), (2L, 31L, 2), (2L, 32L, 3),
      (3L, 40L, 1), (3L, 41L, 2), (3L, 42L, 3)
    ).toDF("qid", "doc", "rnk")
    val qrels = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L)
    ).toDF("qid", "doc")
    val out = Eval.rankingMetrics(ranked, qrels, "qid", "doc", "rnk", k)
      .orderBy("qid").collect()
    assert(out.length == 3)
    val r1 = out(0)
    assert(r1.getDouble(1) == 2.0 / 4.0)
    assert(r1.getDouble(2) == 1.0)
    val idcg3 = Eval.idcgPrefix(k)(2) // min(k=3, nRel=4) = 3
    assert(r1.getDouble(3) == (ws(0) * 1.0 + ws(1) * 0.0 + ws(2) * 1.0) / idcg3)
    val r2 = out(1)
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
    val r3 = out(2)
    assert(r3.getDouble(1) == 0.0 && r3.getDouble(2) == 0.0 && r3.getDouble(3) == 0.0)
  }

  test("rankingMetrics: ideal cutoff uses min(k, nRel) - fewer rels than k") {
    val k = 3
    // q1: 2 rel docs, both retrieved at ranks 1 and 2 => perfect ranking,
    // ndcg must be (w1+w2)/idcg(2) = 1.0 exactly (same fold both sides)
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3)).toDF("qid", "doc", "rnk")
    val qrels = Seq((1L, 10L), (1L, 11L)).toDF("qid", "doc")
    val out = Eval.rankingMetrics(ranked, qrels, "qid", "doc", "rnk", k).collect()
    assert(out.head.getDouble(1) == 1.0) // recall 2/2
    assert(out.head.getDouble(2) == 1.0)
    assert(out.head.getDouble(3) == 1.0) // dcg == idcg bit-for-bit
  }

  test("rankingMetrics: rr is 1/first-hit-rank even when later hits exist") {
    val ranked = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 11L, 3)).toDF("qid", "doc", "rnk")
    val qrels = Seq((1L, 10L), (1L, 11L)).toDF("qid", "doc")
    val out = Eval.rankingMetrics(ranked, qrels, "qid", "doc", "rnk", 3).collect()
    assert(out.head.getDouble(2) == 0.5)
  }

  test("macroMetrics: the two-level pinned fold, replayed by hand") {
    // enough queries to span several buckets at bucketSize 4
    val vals = (0L until 13L).map(q => (q, 1.0 / (q + 1.0), 0.5 * q))
    val perQ = vals.toDF("qid", "recall", "rr")
    val out = Eval.macroMetrics(perQ, "qid", Seq("recall", "rr"), bucketSize = 4L)
      .collect().head
    assert(out.getLong(0) == 13L)
    // reference = the documented association: per-bucket fold in qid
    // order, then a fold over bucket partials ascending (NOT the flat
    // fold — bucketing changes the association, deliberately and
    // reproducibly)
    def twoLevel(xs: Seq[(Long, Double)]): Double =
      xs.groupBy(_._1 / 4).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _))
        .foldLeft(0.0)(_ + _)
    assert(out.getDouble(1) == twoLevel(vals.map(v => v._1 -> v._2)) / 13.0)
    assert(out.getDouble(2) == twoLevel(vals.map(v => v._1 -> v._3)) / 13.0)
    assert(out.schema.fieldNames.toSeq == Seq("n_queries", "mean_recall", "mean_rr"))
  }

  test("macroMetrics: empty input yields a zero row, not NaN") {
    val perQ = Seq.empty[(Long, Double)].toDF("qid", "recall")
    val out = Eval.macroMetrics(perQ, "qid", Seq("recall")).collect().head
    assert(out.getLong(0) == 0L && out.getDouble(1) == 0.0)
  }
}
