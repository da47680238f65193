package graft

import org.apache.spark.sql.functions._

import graft.functions.DetMath
import graft.operators.Bm25
import graft.serve.{DeltaPostingsIndex, MemoryPostingsIndex}

/** The delta lexical tier's contract: serving base ∪ delta documents
  * under RE-DERIVED merged statistics is bit-identical to a fresh
  * rebuild — the property that makes incremental BM25 freshness honest
  * (stale idf/avgdl would silently re-rank everything).
  */
class DeltaPostingsSpec extends SparkSpec {
  import spark.implicits._

  // trailing space + empty text exercise the split(" ", -1) replication
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

  private def statsOf(docs: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
    val s = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    (s.getLong(1), s.getLong(0), s.getLong(0).toDouble / s.getLong(1).toDouble)
  }

  private def freshIndex(docs: org.apache.spark.sql.DataFrame): MemoryPostingsIndex = {
    val postings = Bm25.buildPostings(docs, "id", "text").localCheckpoint(true)
    val (n, _, avgdl) = statsOf(docs)
    val dfMap = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    MemoryPostingsIndex.fromDataFrame(postings, "id",
      Bm25.idfByTerm(dfMap, n, spark), avgdl)
  }

  test("driver lnDet == column lnDet bit-for-bit over the idf domain") {
    val rng = new scala.util.Random(11)
    val xs = (1 to 200).map(_ => 1.0 + rng.nextDouble() * math.pow(10, rng.nextInt(7))) ++
      Seq(1.0, 1.0000001, 2.0, 1024.0, 2.5e14) ++
      // the actual idf arguments: ((n-df)+0.5)/(df+0.5)+1 shapes
      (for (n <- Seq(10L, 1000L, 60000L); df <- Seq(1L, 3L, n / 2, n - 1))
        yield ((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val col_ = DetMath.withLnDet(xs.toDF("x"), "x", "l")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      assert(java.lang.Double.doubleToLongBits(DetMath.lnDet(x)) ==
        java.lang.Double.doubleToLongBits(col_(x)),
        s"driver lnDet($x) drifted from the column form")
    }
  }

  test("delta tier == fresh rebuild bit-for-bit as documents stream in") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val deltaRows = allDocs.where(col("id") > 5)
      .select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (baseN, baseSumDl, _) = statsOf(baseDocs)
    val tier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    val queries = Seq(Seq("spark", "join"), Seq("fast"),
      Seq("vector", "table", "scan"), Seq("index", "nosuchterm"),
      Seq("nosuchterm"))
    // before any adds: == the fresh base-only index, on BOTH read paths
    val base = freshIndex(baseDocs)
    for (q <- queries; k <- Seq(1, 3, 10)) {
      assert(tier.topK(q, k) == base.search(q, k),
        s"empty-delta tier != base index for $q k=$k")
      assert(tier.topKWand(q, k) == base.search(q, k),
        s"empty-delta WAND != base index for $q k=$k")
    }
    // stream documents in one at a time; after EACH add the tier must
    // equal a fresh rebuild over exactly the documents seen so far —
    // and the WAND walk (avgdl-free bounds, delta-seeded θ) must land
    // on the same bits as the exhaustive TAAT reference
    deltaRows.foreach { case (id, text) =>
      tier.addDoc(id, text)
      val seen = allDocs.where(col("id") <= id)
      val fresh = freshIndex(seen)
      for (q <- queries; k <- Seq(1, 3, 10)) {
        assert(tier.topK(q, k) == fresh.search(q, k),
          s"delta tier != rebuild after adding doc $id, for $q k=$k")
        assert(tier.topKWand(q, k) == tier.topK(q, k),
          s"delta WAND != TAAT after adding doc $id, for $q k=$k")
      }
    }
    assert(tier.deltaSize == deltaRows.length.toLong)
    // the pruning is real on a skewed corpus: a rare high-idf term
    // decides θ while the common cursor must skip between its documents
    val skewDocs = ((100L to 400L).map(i =>
      (i, ("common " * (i % 4 + 1).toInt).trim)) ++
      (100L to 400L).filter(_ % 13 == 0).map(i => (i, "common rareterm")))
      .groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).mkString(" ")) }
      .toSeq.toDF("id", "text")
    val (skN, skSum, _) = statsOf(skewDocs)
    val skTier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(skewDocs, "id", "text").localCheckpoint(true),
      "id", skN, skSum)
    skTier.addDoc(999L, "rareterm common")
    val (res, evaluated, skipped) =
      skTier.topKWandCounted(Seq("rareterm", "common"), 4)
    assert(res.size == 4 && skipped > 0L,
      s"expected real base skips (evaluated=$evaluated, skipped=$skipped)")
    assert(res == skTier.topK(Seq("rareterm", "common"), 4))
    // the publish swap: a fresh handle shares the immutable base and
    // starts with an empty delta (== the base-only index again)
    val swapped = tier.fresh()
    assert(swapped.deltaSize == 0L)
    for (q <- queries; k <- Seq(1, 3, 10))
      assert(swapped.topK(q, k) == base.search(q, k),
        s"fresh() handle != base index for $q k=$k")
  }

  test("retract == rebuild bit-for-bit under every add/retract interleaving") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val (baseN, baseSumDl, _) = statsOf(baseDocs)
    val tier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    val queries = Seq(Seq("spark", "join"), Seq("fast"),
      Seq("vector", "table", "scan"), Seq("index", "nosuchterm"))
    val deltaTexts = allDocs.where(col("id") > 5)
      .select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // an interleaving that exercises: retract of the newest add, retract
    // of an OLDER add (postings pruned out of the middle of term
    // vectors), retract down to an empty delta, and re-add of a
    // retracted id — after EVERY op the tier must equal a fresh rebuild
    // over exactly the live doc set, on BOTH read paths
    val ops: Seq[(String, Long)] = Seq(
      "add" -> 6L, "add" -> 7L, "retract" -> 7L, // newest
      "add" -> 8L, "add" -> 9L, "retract" -> 6L, // oldest, empty-text 8 stays
      "retract" -> 8L, "retract" -> 9L,          // down to empty delta
      "add" -> 7L, "add" -> 10L)                 // re-add after retract
    var live = Set.empty[Long]
    ops.foreach { case (op, id) =>
      if (op == "add") { tier.addDoc(id, deltaTexts(id)); live += id }
      else { tier.retractDoc(id); live -= id }
      val fresh = freshIndex(
        allDocs.where(col("id") <= 5 || col("id").isin(live.toSeq: _*)))
      for (q <- queries; k <- Seq(1, 3, 10)) {
        assert(tier.topK(q, k) == fresh.search(q, k),
          s"tier != rebuild after $op($id), live=$live, q=$q k=$k")
        assert(tier.topKWand(q, k) == tier.topK(q, k),
          s"WAND != TAAT after $op($id), live=$live, q=$q k=$k")
      }
      assert(tier.deltaSize == live.size.toLong)
    }
  }

  test("republish folds the delta exactly; seals the old handle; BoundedDelta bounds the segment") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val (baseN, baseSumDl, _) = statsOf(baseDocs)
    val tier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    val deltaTexts = allDocs.where(col("id") > 5)
      .select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // adds incl. an empty text (postings-free doc must still fold into N)
    // and a retract that must NOT survive the fold
    Seq(6L, 7L, 8L, 9L).foreach(id => tier.addDoc(id, deltaTexts(id)))
    tier.retractDoc(7L)
    val queries = Seq(Seq("spark", "join"), Seq("fast"),
      Seq("vector", "table", "scan"), Seq("index", "nosuchterm"))
    val preFold = (for (q <- queries; k <- Seq(1, 3, 10))
      yield (q, k) -> tier.topKWand(q, k)).toMap
    val folded = tier.republish()
    // the folded handle serves EXACTLY the pre-fold results (same bits),
    // == a fresh rebuild over the surviving documents (base 1-5 plus the
    // adds 6/8/9 — 7 was retracted pre-fold, 10 never added)
    val fresh = freshIndex(allDocs.where(col("id") =!= 7L && col("id") =!= 10L))
    for (q <- queries; k <- Seq(1, 3, 10)) {
      assert(folded.topK(q, k) == fresh.search(q, k),
        s"republished handle != rebuild for $q k=$k")
      assert(folded.topKWand(q, k) == preFold((q, k)),
        s"fold changed served results for $q k=$k")
    }
    assert(folded.deltaSize == 0L)
    // the fold PUBLISHED the delta docs: re-adding one is now a base-id
    // rejection, and retracting one points at the republish protocol
    intercept[IllegalArgumentException] { folded.addDoc(6L, "again") }
    val purge = intercept[IllegalArgumentException] { folded.retractDoc(6L) }
    assert(purge.getMessage.contains("republish"))
    // the OLD handle is sealed for writers (a stale write must fail
    // loudly, never land in a discarded delta) but still readable
    intercept[graft.serve.RepublishedHandleException] {
      tier.addDoc(99L, "late write")
    }
    intercept[graft.serve.RepublishedHandleException] { tier.retractDoc(6L) }
    intercept[graft.serve.RepublishedHandleException] { tier.republish() }
    assert(tier.topKWand(Seq("spark", "join"), 3) ==
      preFold((Seq("spark", "join"), 3)))

    // BoundedDelta: the segment never exceeds the bound after a write
    // returns, no write is lost, and results == one never-folded tier
    val bounded = new graft.serve.BoundedDelta(
      DeltaPostingsIndex.fromDataFrame(
        Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
        "id", baseN, baseSumDl), maxDeltaDocs = 3L)
    val unbounded = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    (100L to 110L).foreach { id =>
      val text = s"spark fresh doc${id % 4}"
      val h = bounded.write(_.addDoc(id, text))
      unbounded.addDoc(id, text)
      // read-your-writes on the returned handle
      assert(h.topKWand(Seq("fresh"), 20).exists(_._1 == id))
      assert(bounded.get.deltaSize < 3L,
        s"delta ${bounded.get.deltaSize} not folded at the bound")
      for (q <- queries :+ Seq("fresh"); k <- Seq(3, 20))
        assert(bounded.get.topKWand(q, k) == unbounded.topKWand(q, k),
          s"bounded tier diverged from unbounded after add($id), q=$q k=$k")
    }
    assert(bounded.republishCount == 3L,
      s"11 adds at bound 3 should fold 3 times, got ${bounded.republishCount}")
  }

  test("retract contracts: base id → republish pointer, unknown id, double retract") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val (baseN, baseSumDl, _) = statsOf(baseDocs)
    val tier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    val basePurge = intercept[IllegalArgumentException] { tier.retractDoc(1L) }
    assert(basePurge.getMessage.contains("republish"),
      "a published doc's delete must point the caller at the republish protocol")
    intercept[IllegalArgumentException] { tier.retractDoc(777L) } // never seen
    tier.addDoc(42L, "spark table")
    tier.retractDoc(42L)
    intercept[IllegalArgumentException] { tier.retractDoc(42L) } // already gone
  }

  test("contracts: adds-only (duplicate delta id rejected), k<=0 empty, unknown-only empty") {
    val baseDocs = allDocs.where(col("id") <= 5)
    val (baseN, baseSumDl, _) = statsOf(baseDocs)
    val tier = DeltaPostingsIndex.fromDataFrame(
      Bm25.buildPostings(baseDocs, "id", "text").localCheckpoint(true),
      "id", baseN, baseSumDl)
    tier.addDoc(42L, "spark table")
    intercept[IllegalArgumentException] { tier.addDoc(42L, "again") }
    // an id already in the PUBLISHED BASE is rejected too — accepting it
    // would double-count its score in topK and let topKWand surface the
    // same doc_id twice (delta seed + base walk each offer a heap entry)
    intercept[IllegalArgumentException] { tier.addDoc(1L, "spark table") }
    assert(tier.topK(Seq("spark"), 0).isEmpty)
    assert(tier.topK(Seq("zzz"), 5).isEmpty)
    intercept[IllegalArgumentException] {
      DeltaPostingsIndex.fromDataFrame(
        Bm25.buildPostings(baseDocs, "id", "text"), "id", 0L, 0L)
    }
  }
}
