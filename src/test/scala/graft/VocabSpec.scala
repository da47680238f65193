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

  test("sketch leg: exact inside the capacity window (capacity >= distinct tokens)") {
    val exactV = Vocab.vocabulary(docs, "text", 3).collect().toSeq
    val approxV = Vocab.vocabularyApprox(docs, "text", 3, capacity = 64)
      .collect().toSeq
    assert(approxV == exactV)
    val exactO = Vocab.oovStats(docs, "doc_id", "text", 2).collect().toSet
    val approxO = Vocab.oovStatsApprox(docs, "doc_id", "text", 2, capacity = 64)
      .collect().toSet
    assert(approxO == exactO)
  }

  test("sketch leg: tight capacity keeps every heavy hitter (undercount <= N/(cap+1))") {
    // one row, one partition: counts a:50 b:30 + 20 singletons, N=100;
    // capacity=4 -> undercount <= 20, so a and b MUST survive
    val text = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (0 until 20).map(i => s"t$i")).mkString(" ")
    val df = Seq(Tuple1(text)).toDF("text")
    val got = Vocab.vocabularyApprox(df, "text", v = 4, capacity = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("a") && got.contains("b"),
      s"heavy hitters missing from $got")
    assert(got("a") >= 30 && got("a") <= 50 && got("b") >= 10 && got("b") <= 30,
      s"estimates outside the MG bound: $got")
  }

  test("sketch leg plan: nothing shuffles by token — the one-pass claim") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = Vocab.oovStatsApprox(docs, "doc_id", "text", 2, capacity = 64)
      .queryExecution.sparkPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    shuffles.foreach { s =>
      assert(!s.outputPartitioning.toString.contains("token"),
        s"token-keyed shuffle in the sketch leg:\n$plan")
    }
  }

  test("heavyHittersByGroup: per-group top-k with tie-break, exact in-window") {
    val grouped = Seq(
      (1L, "s1", "a a b c"), (2L, "s1", "b b b d"),
      (3L, "s2", "a c c e"), (4L, "s2", "e e a")
    ).toDF("doc_id", "source", "text")
    // s1: b:4 a:2 c:1 d:1 — top2 = b, a; s2: e:3 a:2 c:2 — top2 = e, a (tie a<c)
    val got = Vocab.heavyHittersByGroup(grouped, "source", "text",
        k = 2, capacity = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("s1", "b", 4L, 1L), ("s1", "a", 2L, 2L),
      ("s2", "e", 3L, 1L), ("s2", "a", 2L, 2L)))
  }

  test("heavyHittersByGroup plan: token stream never shuffles; only (group, sketch) partials do") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val grouped = Seq((1L, "s1", "a b"), (2L, "s2", "c d"))
      .toDF("doc_id", "source", "text")
    val plan = Vocab.heavyHittersByGroup(grouped, "source", "text", 2, 64)
      .queryExecution.sparkPlan
    plan.collect { case s: ShuffleExchangeExec => s }.foreach { s =>
      assert(!s.outputPartitioning.toString.contains("token"),
        s"token-keyed shuffle in the per-group sketch:\n$plan")
    }
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

  test("topPostings equals the rank-window brute force; no per-term sort in the plan") {
    val corpus = Seq(
      (1L, "x x x y"), (2L, "x x y y"), (3L, "x y"), (4L, "x x x x"),
      (5L, "z")
    ).toDF("doc_id", "text")
    val got = Vocab.topPostings(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // x: tf 4@4, 3@1, 2@2, 1@3 -> top2 (4,4),(1,3); y: 2@2, 1@1, 1@3 -> (2,2),(1,1)
    assert(got == Set(
      ("x", 1L, 4L, 4L), ("x", 2L, 1L, 3L),
      ("y", 1L, 2L, 2L), ("y", 2L, 1L, 1L),
      ("z", 1L, 5L, 1L)))
    val plan = Vocab.topPostings(corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort ["),
      s"per-term sort/window leaked into the postings plan:\n$plan")
  }

  // ---- streaming Misra-Gries accumulate (streaming/MgStream)

  test("MgStream accumulate in-window: sliced arrival lands on exact per-group counts") {
    import graft.streaming.MgStream
    val tmp = java.nio.file.Files.createTempDirectory("mgstream").toString
    val table = s"$tmp/t"
    val rows = (0 until 120).map(i =>
      (s"g${i % 3}", s"tok${i % 7} tok${i % 5} filler"))
      .toDF("source", "text")
    (0 until 3).foreach { sl =>
      val slice = rows.where(crc32(col("text")) % 3 === sl)
      MgStream.accumulateBatch(table,
        MgStream.mgPartial(slice, "source", "text", capacity = 64),
        "source", capacity = 64)
    }
    val acc = spark.read.parquet(table)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = rows
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(acc == exact,
      "inside the capacity window the accumulated table must equal exact counts")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("MgStream accumulate over capacity: table merge == the aggregator's merge rule") {
    import graft.streaming.MgStream
    val tmp = java.nio.file.Files.createTempDirectory("mgstream2").toString
    val table = s"$tmp/t"
    val cap = 3
    val m1 = Map("a" -> 5L, "b" -> 3L, "c" -> 2L)
    val m2 = Map("b" -> 4L, "d" -> 6L, "e" -> 1L)
    def asDf(m: Map[String, Long]) =
      m.toSeq.map { case (t, n) => ("g", t, n) }.toDF("source", "token", "n")
    MgStream.accumulateBatch(table, asDf(m1), "source", cap)
    MgStream.accumulateBatch(table, asDf(m2), "source", cap)
    val got = spark.read.parquet(table)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val want = new Vocab.MisraGries(cap).merge(m1, m2)
    // sums: a:5 b:7 c:2 d:6 e:1 -> 4th largest = 2 -> a:3 b:5 d:4
    assert(want == Map("a" -> 3L, "b" -> 5L, "d" -> 4L), s"reference drifted: $want")
    assert(got == want, s"table merge $got != aggregator merge $want")
    assert(got.size <= cap, "per-group state must stay within capacity")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
