package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Pii, Upsert}

/** Specs for the corpus-rewrite additions: PII scrub (q104), token-window
  * chunking (q105), and the latest-wins merge (q106).
  */
class ScrubOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- pii

  test("pii: counts and redaction, multiple matches per class") {
    val df = Seq((1L,
      "mail a@b.co and c.d@e.org call 555-123-4567 or 555-000-1111 ip 1.2.3.4 end"))
      .toDF("doc_id", "text")
    val r = Pii.scrub(df, "text")
      .select("n_emails", "n_ipv4", "n_phones", "redacted").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 2L)
    assert(r.getString(3) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> or <PHONE> ip <IP> end")
  }

  test("pii: null text yields null counts and null redacted; clean text is unchanged") {
    val df = Seq((1L, null: String), (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val rows = Pii.scrub(df, "text").orderBy("doc_id")
      .select("n_emails", "n_ipv4", "n_phones", "redacted").collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) && rows(0).isNullAt(2)
      && rows(0).isNullAt(3))
    assert(rows(1).getLong(0) == 0L && rows(1).getString(3) == "no pii here at all")
  }

  test("pii: placeholders cannot cascade into new matches (scrub is idempotent)") {
    val df = Seq((1L, "u@v.io 1.2.3.4 555-123-4567")).toDF("doc_id", "text")
    val once = Pii.scrub(df, "text").select(col("redacted").as("text"))
    val twice = Pii.scrub(once, "text")
      .select("n_emails", "n_ipv4", "n_phones", "redacted").head()
    assert(twice.getLong(0) == 0L && twice.getLong(1) == 0L && twice.getLong(2) == 0L)
    assert(twice.getString(3) == "<EMAIL> <IP> <PHONE>")
  }

  test("pii: syntactic ipv4 over-redacts dotted runs (the documented contract)") {
    // version strings embed a syntactic dotted quad; crawl-scrubbing recipes
    // accept the over-redaction rather than parse octet ranges
    val df = Seq((1L, "semver 1.2.3 stays, 10.0.0.1 goes")).toDF("doc_id", "text")
    val r = Pii.scrub(df, "text").select("n_ipv4", "redacted").head()
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "semver 1.2.3 stays, <IP> goes")
  }

  test("pii: scrub plans with zero exchanges (map-only full-corpus rewrite)") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Pii.scrub(df, "text").queryExecution.sparkPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"PII scrub must not shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- chunk

  test("chunk: hand-computed windows with overlap and a short tail") {
    // 8 tokens, size 3, stride 2 → starts 0,2,4,6 → last chunk is 2 tokens
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text")
    val got = Chunk.tokenWindows(df, "doc_id", "text", size = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "t1 t2 t3", 3L), (1L, "t3 t4 t5", 3L),
      (2L, "t5 t6 t7", 3L), (3L, "t7 t8", 2L)))
  }

  test("chunk: docs at or below one window yield exactly one chunk") {
    val df = Seq((1L, "a b c"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val got = Chunk.tokenWindows(df, "doc_id", "text", size = 3, stride = 2)
      .orderBy("doc_id").select("doc_id", "chunk_text", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a b c", 3L), (2L, "a b", 2L), (3L, "a", 1L)))
  }

  test("chunk: every token is covered — de-overlapped concatenation rebuilds the doc") {
    val text = (1 to 29).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunk.tokenWindows(df, "doc_id", "text", size = 7, stride = 4)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    val rebuilt = chunks.head.split(" ") ++
      chunks.tail.flatMap(_.split(" ").drop(3)) // size - stride = 3 overlap
    assert(rebuilt.mkString(" ") == text)
  }

  test("chunk: null text produces no chunks; stride > size is rejected") {
    val df = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val got = Chunk.tokenWindows(df, "doc_id", "text", size = 4, stride = 4)
    assert(got.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    intercept[IllegalArgumentException] {
      Chunk.tokenWindows(df, "doc_id", "text", size = 4, stride = 5)
    }
  }

  test("chunk: plans with zero exchanges (explode inside the scan stage)") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Chunk.tokenWindows(df, "doc_id", "text", size = 3, stride = 2)
      .queryExecution.sparkPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"chunking must not shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- upsert

  private lazy val mergeBase = Seq(
    (1L, "alpha", 1L, 0), (2L, "beta", 1L, 0))
    .toDF("id", "payload", "version", "prio")

  test("upsert: updates replace matched keys, new keys insert, others survive") {
    val upd = Seq((2L, "beta2", 2L, 1), (3L, "gamma", 2L, 1))
      .toDF("id", "payload", "version", "prio")
    val got = Upsert.latestWins(mergeBase, upd, Seq("id"), "version", "prio")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "alpha", 1L), (2L, "beta2", 2L), (3L, "gamma", 2L)))
  }

  test("upsert: equal versions fall back to the priority tiebreak (update wins)") {
    val upd = Seq((1L, "alpha-refreshed", 1L, 1))
      .toDF("id", "payload", "version", "prio")
    val got = Upsert.latestWins(mergeBase, upd, Seq("id"), "version", "prio")
      .where(col("id") === 1L).select("payload").as[String].head()
    assert(got == "alpha-refreshed")
  }

  test("upsert: mismatched schemas are rejected") {
    val bad = Seq((1L, "x", 2L)).toDF("id", "payload", "version")
    intercept[IllegalArgumentException] {
      Upsert.latestWins(mergeBase, bad, Seq("id"), "version", "prio")
    }
  }

  test("upsert: plans as a hash aggregation — no window, no sort") {
    val upd = Seq((2L, "beta2", 2L, 1)).toDF("id", "payload", "version", "prio")
    val plan = Upsert.latestWins(mergeBase, upd, Seq("id"), "version", "prio")
      .queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"latest-wins must not plan a window:\n$plan")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"latest-wins must not sort:\n$plan")
    // two-phase agg: a map-side Partial below the shuffle, Final above — the
    // shuffle carries one candidate per (key, partition), not every row
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.size >= 2, s"expected partial+final aggregation:\n$plan")
  }
}
