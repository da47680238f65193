package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Forget}

/** Deletion-propagation contracts: the incremental amendments must land
  * exactly on a full rebuild over the remaining corpus — stats by
  * integer subtraction, postings by row drop, BM25 scores bit-for-bit.
  */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "dup dup stream fast", "src1"),
    (2L, "vector stream join", "src1"),
    (3L, "dup vector vector scan", "src2"),
    (4L, "stream stream stream", "src2"),
    (5L, "solo onlyword", "src3"), // purging this kills 'solo'/'onlyword'
    (6L, "dup join scan hash fast", "src3"),
    (7L, null, "src3") // null text: no postings rows, still counts in N
  ).toDF("doc_id", "text", "source")

  private val purged = Seq(2L, 5L, 7L)

  test("corpus purge: broadcast anti-join plan; survivors only") {
    val purgeDf = docs.where(col("doc_id").isin(purged: _*)).select("doc_id")
    val out = Forget.purgeCorpus(docs, "doc_id", purgeDf, "doc_id")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 6L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"corpus purge must be a broadcast anti-join:\n$plan")
  }

  test("incremental lex deltas == rebuild-from-scratch stats exactly") {
    val postings = Bm25.buildPostings(docs, "doc_id", "text").localCheckpoint(true)
    val deltas = Forget.lexDeltas(postings, docs, "doc_id", "text", purged)
    assert(deltas.docsDropped == 3) // incl. the null-text doc
    assert(deltas.dlDropped == 3 + 2) // "vector stream join" + "solo onlyword"; null text adds 0
    assert(deltas.affectedTerms == Set("vector", "stream", "join", "solo", "onlyword"))
    // amended df == df of a rebuilt index over the remaining docs
    val dfFull = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val remaining = docs.where(!col("doc_id").isin(purged: _*))
    val dfRebuilt = Bm25.buildPostings(remaining, "doc_id", "text")
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Forget.updatedDf(dfFull, deltas) == dfRebuilt,
      "amended df drifted from the rebuild (terms of fully-purged docs must vanish)")
  }

  test("amended postings + amended stats serve BM25 == full rebuild, bit-for-bit") {
    val postings = Bm25.buildPostings(docs, "doc_id", "text").localCheckpoint(true)
    val dstats = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val (sumDl, n) = (dstats.getLong(0), dstats.getLong(1))
    val dfMap = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val deltas = Forget.lexDeltas(postings, docs, "doc_id", "text", purged)
    val n2 = n - deltas.docsDropped
    val avgdl2 = (sumDl - deltas.dlDropped).toDouble / n2.toDouble
    val idf2 = Bm25.idfByTerm(Forget.updatedDf(dfMap, deltas), n2, spark)
    val amended = Bm25.searchPostings(
        Forget.purgePostings(postings, "doc_id", purged),
        "doc_id", Seq("dup", "stream", "scan"), idf2, avgdl2, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the rebuild: postings, stats, idf all from the remaining corpus
    val remaining = docs.where(!col("doc_id").isin(purged: _*))
    val rp = Bm25.buildPostings(remaining, "doc_id", "text").localCheckpoint(true)
    val rstats = remaining.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val rAvg = rstats.getLong(0).toDouble / rstats.getLong(1).toDouble
    val rDf = rp.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rIdf = Bm25.idfByTerm(rDf, rstats.getLong(1), spark)
    val rebuilt = Bm25.searchPostings(rp, "doc_id",
        Seq("dup", "stream", "scan"), rIdf, rAvg, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(amended == rebuilt,
      s"amended serve drifted from rebuild: $amended vs $rebuilt")
    assert(amended.nonEmpty && !amended.exists(_._1 == 2L),
      "purged doc must not score")
  }

  test("purging a doc whose terms survive elsewhere leaves other rows byte-identical") {
    val postings = Bm25.buildPostings(docs, "doc_id", "text").localCheckpoint(true)
    val before = postings.where(!col("doc_id").isin(purged: _*))
      .collect().map(_.toString).sorted.toSeq
    val after = Forget.purgePostings(postings, "doc_id", purged)
      .collect().map(_.toString).sorted.toSeq
    assert(before == after, "purge must not touch surviving docs' rows")
  }

  /** The SERVING-tier purge protocol (q293 / tools/RepublishProbe): a
    * purge reaches the memory/delta tiers as a REPUBLISH — amended
    * postings + subtraction-amended stats load into a fresh handle, the
    * old handle's in-flight delta docs replay onto it (minus any that
    * were themselves purged), and cutover is the O(1) reference swap.
    * Before the swap the purged doc is servable (the staleness window is
    * real — the SLA is the measured republish latency); after, it is
    * unservable on BOTH the fresh base and the replayed delta view, and
    * the replayed view equals a fresh rebuild over (remaining ∪ inflight).
    */
  test("serving republish: purged doc servable pre-swap, unservable post-swap; in-flight delta replays") {
    val postings = Bm25.buildPostings(docs, "doc_id", "text").localCheckpoint(true)
    val dstats = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val (sumDl, n) = (dstats.getLong(0), dstats.getLong(1))
    val dfMap = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = Bm25.idfByTerm(dfMap, n, spark)
    val avgdl = sumDl.toDouble / n.toDouble
    val serving = new java.util.concurrent.atomic.AtomicReference(
      graft.serve.MemoryPostingsIndex.fromDataFrame(postings, "doc_id", idf, avgdl))
    // doc 2 contains 'vector': servable pre-swap at exhaustive k = df
    assert(serving.get().searchWand(Seq("vector"), dfMap("vector").toInt)
      .exists(_._1 == 2L), "purged doc must be servable before the swap")
    // in-flight adds land on the OLD handle's delta during the republish
    // (one of them is itself on the purge list and must not replay)
    val oldDelta = graft.serve.DeltaPostingsIndex.fromDataFrame(
      postings, "doc_id", n, sumDl)
    oldDelta.addDoc(100L, "vector fresh arrival")
    oldDelta.addDoc(101L, "dup fresh arrival")
    val inFlight = Seq((100L, "vector fresh arrival"), (101L, "dup fresh arrival"))
    val purgedAll = purged :+ 100L
    // republish: amend, reload, replay, swap
    val deltas = Forget.lexDeltas(postings, docs, "doc_id", "text", purged)
    val n2 = n - deltas.docsDropped
    val sumDl2 = sumDl - deltas.dlDropped
    val avgdl2 = sumDl2.toDouble / n2.toDouble
    val idf2 = Bm25.idfByTerm(Forget.updatedDf(dfMap, deltas), n2, spark)
    val amended = Forget.purgePostings(postings, "doc_id", purged)
      .localCheckpoint(true)
    serving.set(graft.serve.MemoryPostingsIndex.fromDataFrame(
      amended, "doc_id", idf2, avgdl2))
    val freshDelta = graft.serve.DeltaPostingsIndex.fromDataFrame(
      amended, "doc_id", n2, sumDl2)
    inFlight.foreach { case (id, text) =>
      if (!purgedAll.contains(id)) freshDelta.addDoc(id, text)
    }
    // post-swap: no purged id servable on either view, even exhaustively
    for (term <- dfMap.keys) {
      val kAll = dfMap(term).toInt + inFlight.size
      assert(!serving.get().searchWand(Seq(term), kAll)
        .exists(r => purgedAll.contains(r._1)), s"base serves purged for $term")
      assert(!freshDelta.topKWand(Seq(term), kAll)
        .exists(r => purgedAll.contains(r._1)), s"delta serves purged for $term")
    }
    // the replayed in-flight doc that was NOT purged is servable
    assert(freshDelta.topKWand(Seq("fresh"), 5).exists(_._1 == 101L),
      "surviving in-flight doc must replay onto the fresh handle")
    // and the replayed view == a fresh rebuild over remaining + in-flight
    val union = docs.where(!col("doc_id").isin(purged: _*))
      .select("doc_id", "text")
      .unionByName(Seq((101L, "dup fresh arrival")).toDF("doc_id", "text"))
      .localCheckpoint(true)
    val up = Bm25.buildPostings(union, "doc_id", "text").localCheckpoint(true)
    val ustats = union.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val uIdf = Bm25.idfByTerm(up.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap, ustats.getLong(1), spark)
    val rebuilt = graft.serve.MemoryPostingsIndex.fromDataFrame(up, "doc_id",
      uIdf, ustats.getLong(0).toDouble / ustats.getLong(1).toDouble)
    for (terms <- Seq(Seq("dup"), Seq("vector", "stream"), Seq("fresh", "dup")))
      assert(freshDelta.topKWand(terms, 10) == rebuilt.searchWand(terms, 10),
        s"replayed delta view != rebuild for $terms")
  }

  /** The OTHER half of the purge protocol (q294): a purge that arrives
    * for a doc which has NOT yet published — it lives only in the live
    * handle's delta segment — needs no republish at all. `retractDoc`
    * takes effect on the next query (staleness window: zero), exactly,
    * because the unpublished doc's full term vector is known and every
    * stat it touched reverses as integer subtraction. A published doc's
    * purge on the live handle is rejected with the republish pointer —
    * the two halves meet: retract for the in-flight window, measured
    * republish cutover (test above) for everything published.
    */
  test("in-flight purge: retractDoc is immediate and exact; published purge points at republish") {
    val postings = Bm25.buildPostings(docs, "doc_id", "text").localCheckpoint(true)
    val dstats = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val (sumDl, n) = (dstats.getLong(0), dstats.getLong(1))
    val live = graft.serve.DeltaPostingsIndex.fromDataFrame(
      postings, "doc_id", n, sumDl)
    live.addDoc(100L, "vector fresh arrival")
    live.addDoc(101L, "dup fresh arrival")
    assert(live.topKWand(Seq("fresh"), 5).exists(_._1 == 100L))
    // purge request for the unpublished doc 100: immediate, no republish
    live.retractDoc(100L)
    assert(!live.topKWand(Seq("fresh"), 5).exists(_._1 == 100L),
      "retracted in-flight doc must be unservable on the next query")
    // ...and EXACT: the live handle == a rebuild over docs ∪ {101}
    val union = docs.select("doc_id", "text")
      .unionByName(Seq((101L, "dup fresh arrival")).toDF("doc_id", "text"))
      .localCheckpoint(true)
    val up = Bm25.buildPostings(union, "doc_id", "text").localCheckpoint(true)
    val ustats = union.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val uIdf = Bm25.idfByTerm(up.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap, ustats.getLong(1), spark)
    val rebuilt = graft.serve.MemoryPostingsIndex.fromDataFrame(up, "doc_id",
      uIdf, ustats.getLong(0).toDouble / ustats.getLong(1).toDouble)
    for (terms <- Seq(Seq("dup"), Seq("vector", "stream"), Seq("fresh", "dup")))
      assert(live.topKWand(terms, 10) == rebuilt.searchWand(terms, 10),
        s"post-retract live view != rebuild for $terms")
    // a published doc's purge cannot be served by the live handle
    val rejected = intercept[IllegalArgumentException] { live.retractDoc(2L) }
    assert(rejected.getMessage.contains("republish"))
  }
}
