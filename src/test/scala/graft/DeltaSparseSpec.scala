package graft

import org.apache.spark.sql.functions._

import graft.operators.Sparse
import graft.serve.{DeltaSparseIndex, MemorySparseIndex}

/** The delta sparse tier's contract: base-WAND merged with the
  * exhaustively-scored delta segment equals a fresh rebuild over the
  * surviving documents exactly — the fan-out lemma applied to
  * freshness (no corpus statistics exist to drift, so adds AND
  * retractions are both trivially exact; the property still needs
  * pinning because the merge rule and the postings shape could drift).
  */
class DeltaSparseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val allDocs = Seq(
    (1L, "spark fast join fast fast"),
    (2L, "spark slow scan"),
    (3L, "join join join table table"),
    (4L, "vector search vector index"),
    (5L, "spark join fast"),
    (6L, "fast scan index scan"),
    (7L, "table scan "),
    (8L, ""),
    (9L, "vector join vector table spark"),
    (10L, "index index fast")
  ).toDF("id", "text")

  /** The shared driver twin of [[Sparse.tfVectors]]'s tokenization. */
  private def weightsOf(text: String): Map[String, Long] =
    Sparse.tfWeights(text)

  private def freshIndex(docs: org.apache.spark.sql.DataFrame): MemorySparseIndex =
    MemorySparseIndex.fromDataFrame(
      Sparse.tfVectors(docs, "id", "text").localCheckpoint(true), "id")

  private val queries: Seq[Map[String, Long]] = Seq(
    Map("spark" -> 2L, "join" -> 1L),
    Map("fast" -> 3L),
    Map("vector" -> 1L, "table" -> 2L, "scan" -> 1L),
    Map("index" -> 1L, "nosuchterm" -> 5L),
    Map("nosuchterm" -> 1L))

  test("delta sparse == fresh rebuild exactly under adds and retractions") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val tier = DeltaSparseIndex.fromDataFrame(
      Sparse.tfVectors(baseDocs, "id", "text").localCheckpoint(true), "id")
    val texts = allDocs.where(col("id") > 5)
      .select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // empty delta == the base-only index on both read paths
    val base = freshIndex(baseDocs)
    for (q <- queries; k <- Seq(1, 3, 10)) {
      assert(tier.topK(q, k) == base.topK(q, k))
      assert(tier.topKWand(q, k) == base.topKWand(q, k))
    }
    // interleaved adds/retracts: newest, oldest, down-to-empty, re-add —
    // after EVERY op the tier must equal a rebuild over the live set
    val ops: Seq[(String, Long)] = Seq(
      "add" -> 6L, "add" -> 7L, "retract" -> 7L,
      "add" -> 8L, "add" -> 9L, "retract" -> 6L,
      "retract" -> 8L, "retract" -> 9L,
      "add" -> 7L, "add" -> 10L)
    var live = Set.empty[Long]
    ops.foreach { case (op, id) =>
      if (op == "add") { tier.addDoc(id, weightsOf(texts(id))); live += id }
      else { tier.retractDoc(id); live -= id }
      val fresh = freshIndex(
        allDocs.where(col("id") <= 5 || col("id").isin(live.toSeq: _*)))
      for (q <- queries; k <- Seq(1, 3, 10)) {
        assert(tier.topK(q, k) == fresh.topK(q, k),
          s"tier != rebuild after $op($id), live=$live, q=$q k=$k")
        assert(tier.topKWand(q, k) == tier.topK(q, k),
          s"WAND merge != TAAT after $op($id), live=$live, q=$q k=$k")
      }
      assert(tier.deltaSize == live.size.toLong)
    }
    // the publish swap: fresh handle == the base-only index again
    val swapped = tier.fresh()
    assert(swapped.deltaSize == 0L)
    for (q <- queries; k <- Seq(1, 3, 10))
      assert(swapped.topK(q, k) == base.topK(q, k))
  }

  test("base WAND pruning survives the delta merge (counters non-vacuous)") {
    val skewDocs = ((100L to 400L).map(i =>
      (i, ("common " * (i % 4 + 1).toInt).trim)) ++
      (100L to 400L).filter(_ % 13 == 0).map(i => (i, "common rareterm")))
      .groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).mkString(" ")) }
      .toSeq.toDF("id", "text")
    val tier = DeltaSparseIndex.fromDataFrame(
      Sparse.tfVectors(skewDocs, "id", "text").localCheckpoint(true), "id")
    tier.addDoc(999L, Map("rareterm" -> 1L, "common" -> 1L))
    val (res, evaluated, skipped) =
      tier.topKWandCounted(Map("rareterm" -> 10L, "common" -> 1L), 4)
    assert(res.size == 4 && skipped > 0L,
      s"expected real base skips (evaluated=$evaluated, skipped=$skipped)")
    assert(res == tier.topK(Map("rareterm" -> 10L, "common" -> 1L), 4))
  }

  test("republish folds exactly; seals the old handle; BoundedDelta keeps add+retract atomic") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val texts = allDocs.where(col("id") > 5)
      .select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tier = DeltaSparseIndex.fromDataFrame(
      Sparse.tfVectors(baseDocs, "id", "text").localCheckpoint(true), "id")
    Seq(6L, 7L, 9L, 10L).foreach(id => tier.addDoc(id, weightsOf(texts(id))))
    tier.retractDoc(7L)
    val preFold = (for (q <- queries; k <- Seq(1, 3, 10))
      yield (q, k) -> tier.topKWand(q, k)).toMap
    val folded = tier.republish()
    val fresh = freshIndex(
      allDocs.where(col("id") =!= 7L && col("id") =!= 8L))
    for (q <- queries; k <- Seq(1, 3, 10)) {
      assert(folded.topK(q, k) == fresh.topK(q, k),
        s"republished handle != rebuild for $q k=$k")
      assert(folded.topKWand(q, k) == preFold((q, k)),
        s"fold changed served results for $q k=$k")
    }
    assert(folded.deltaSize == 0L)
    intercept[IllegalArgumentException] { folded.addDoc(6L, Map("x" -> 1L)) }
    val purge = intercept[IllegalArgumentException] { folded.retractDoc(6L) }
    assert(purge.getMessage.contains("republish"))
    intercept[graft.serve.RepublishedHandleException] {
      tier.addDoc(99L, Map("late" -> 1L))
    }
    intercept[graft.serve.RepublishedHandleException] { tier.retractDoc(6L) }
    // readers keep the pre-fold snapshot
    assert(tier.topKWand(queries.head, 3) == preFold((queries.head, 3)))

    // BoundedDelta with the in-flight-purge write shape: the add+retract
    // pair runs atomically inside write(), so a fold can never publish
    // the add before its retract — every 3rd doc must stay gone
    val bounded = new graft.serve.BoundedDelta(
      DeltaSparseIndex.fromDataFrame(
        Sparse.tfVectors(baseDocs, "id", "text").localCheckpoint(true),
        "id"), maxDeltaDocs = 2L)
    (100L to 112L).foreach { id =>
      val h = bounded.write { t =>
        t.addDoc(id, Map("fresh" -> 1L, s"doc${id % 5}" -> 2L))
        if (id % 3 == 0) t.retractDoc(id)
      }
      assert(h.topK(Map("fresh" -> 1L), 20).exists(_._1 == id) == (id % 3 != 0))
      assert(bounded.get.deltaSize < 2L)
    }
    val survivors = (100L to 112L).filter(_ % 3 != 0)
    val served = bounded.get.topK(Map("fresh" -> 1L), 50).map(_._1).toSet
    assert(survivors.forall(served.contains),
      s"lost a surviving write: $served vs $survivors")
    assert((100L to 112L).filter(_ % 3 == 0).forall(!served.contains(_)),
      "a retracted add leaked through a fold")
    assert(bounded.republishCount > 0L)
  }

  test("contracts: id guards, positive weights, republish pointer, k<=0, unknown-only") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val tier = DeltaSparseIndex.fromDataFrame(
      Sparse.tfVectors(baseDocs, "id", "text").localCheckpoint(true), "id")
    tier.addDoc(42L, Map("spark" -> 1L))
    intercept[IllegalArgumentException] { tier.addDoc(42L, Map("x" -> 1L)) }
    intercept[IllegalArgumentException] { tier.addDoc(1L, Map("x" -> 1L)) }
    intercept[IllegalArgumentException] { tier.addDoc(43L, Map.empty) }
    intercept[IllegalArgumentException] { tier.addDoc(43L, Map("x" -> 0L)) }
    intercept[IllegalArgumentException] { tier.addDoc(43L, Map("x" -> -2L)) }
    val basePurge = intercept[IllegalArgumentException] { tier.retractDoc(2L) }
    assert(basePurge.getMessage.contains("republish"))
    intercept[IllegalArgumentException] { tier.retractDoc(777L) }
    tier.retractDoc(42L)
    intercept[IllegalArgumentException] { tier.retractDoc(42L) } // gone
    assert(tier.topK(Map("spark" -> 1L), 0).isEmpty)
    assert(tier.topKWand(Map("spark" -> 1L), -1).isEmpty)
    assert(tier.topK(Map("zzz" -> 1L), 5).isEmpty)
  }
}
