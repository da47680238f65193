package graft

import org.apache.spark.sql.functions._

import graft.operators.Vocab

/** Vocabulary fitting + OOV scoring: hand-computed truth, tie-break
  * determinism, null-text rule, and the two plan contracts (shared tf
  * exchange, top-V as a bounded heap not a global sort).
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a b c"),     // a:2 b:1 c:1
    (2L, "b b b d"),     // b:3 d:1
    (3L, "a c c e"),     // a:1 c:2 e:1
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")
  // corpus totals: b:4, a:3, c:3, d:1, e:1

  test("vocabulary: top-V by count with token-asc tie-break") {
    val v2 = Vocab.vocabulary(docs, "text", 2).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v2.toSeq == Seq(("b", 4L), ("a", 3L))) // a beats c on the tie at 3
    val v3 = Vocab.vocabulary(docs, "text", 3).collect().map(_.getString(0))
    assert(v3.toSeq == Seq("b", "a", "c"))
  }

  test("oovStats: hand-computed occurrence counts; null text absent") {
    // V=2 -> vocab {b, a}; OOV tokens: c, d, e
    val got = Vocab.oovStats(docs, "doc_id", "text", v = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 (null text) has no token stream
    assert(got(1L) == ((4L, 1L, 0.25)))   // c is OOV
    assert(got(2L) == ((4L, 1L, 0.25)))   // d is OOV
    assert(got(3L) == ((4L, 3L, 0.75)))   // c c e OOV
  }

  test("oovStats: v covering the whole vocabulary means zero OOV") {
    val got = Vocab.oovStats(docs, "doc_id", "text", v = 100)
    assert(got.where(col("n_oov") =!= 0L).isEmpty)
  }

  test("oovStats: partitioning-independent (deterministic vocabulary)") {
    val a = Vocab.oovStats(docs, "doc_id", "text", v = 2).collect().toSet
    val b = Vocab.oovStats(docs.repartition(7), "doc_id", "text", v = 2)
      .collect().toSet
    assert(a == b)
  }

  test("plan: tf exchange shared by totals and join-back; top-V is a bounded heap") {
    val out = Vocab.oovStats(docs, "doc_id", "text", v = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the (doc, token) exchange shared via ReuseExchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-V as TakeOrderedAndProject, not a global sort:\n$plan")
  }
}
