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
}
