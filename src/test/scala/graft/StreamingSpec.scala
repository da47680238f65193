package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.embed.HashingTfEmbedder
import graft.operators.Ann
import graft.streaming.{EventStream, IncrementalIndex}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ID", StringType),
    StructField("EMBED_STR", StringType),
    StructField("CREATED_AT", TimestampType)))

  test("incremental index: appended corpus files get embedded within a trigger") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val idx = Files.createTempDirectory("graft-stream-idx").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString

    def write(batch: Seq[(String, String, java.sql.Timestamp)], name: String): Unit =
      batch.toDF("ID", "EMBED_STR", "CREATED_AT")
        .coalesce(1).write.mode("append").parquet(src)

    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    write(Seq(("A", "first workout text", t0), ("B", "second text", t0)), "b1")

    val q = IncrementalIndex.start(spark, src, schema, HashingTfEmbedder(64),
      idx, chk, trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)

    val out1 = spark.read.parquet(idx)
    assert(out1.count() == 2)
    assert(out1.where(col("EMBEDDING").isNotNull).count() == 2)

    // cache-growth loop (02:415-418): new file appended -> picked up next run
    write(Seq(("C", "third generated workout", t0)), "b2")
    val q2 = IncrementalIndex.start(spark, src, schema, HashingTfEmbedder(64),
      idx, chk, trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val out2 = spark.read.parquet(idx)
    assert(out2.count() == 3)
    assert(out2.select("ID").distinct().count() == 3)
  }

  test("append-mode emission rule: window_end <= watermark, inclusive at the boundary") {
    // q70's DuckDB oracle hard-codes Spark's emission semantics: final
    // watermark = max event time (ms-truncated) - delay, and a window is
    // emitted iff its END is <= that watermark, INCLUSIVE. This test places
    // max(ts) so the watermark lands exactly ON a window end — if a Spark
    // upgrade ever flips the rule to strict '<' (or changes the ms
    // truncation), this fails here with a readable message instead of as a
    // mysterious q70 gate mismatch.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.windowedCounts(df, "30 minutes", "2 hours")
    val sink = "append_rule_sink"
    val q = agg.select(col("window.start").cast("string").as("w_start"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // window A = [10:00, 10:30); max ts 12:30:00.000 -> watermark 10:30:00.000
    // == A.end exactly -> A must be EMITTED under the inclusive rule
    mem.addData((ts("2025-01-01 10:05:00"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts("2025-01-01 12:30:00"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts("2025-01-01 23:00:00"), "click", 1.0)) // advance further
    q.processAllAvailable()
    // one more data batch so the 12:30 window (end 13:00 <= watermark 21:00)
    // emits inside a DATA batch — not dependent on no-data batch timing
    mem.addData((ts("2025-01-01 23:10:00"), "click", 1.0))
    q.processAllAvailable()
    val emitted = spark.table(sink).as[String].collect().toSet
    q.stop()
    spark.catalog.dropTempView(sink)
    assert(emitted.contains("2025-01-01 10:00:00"),
      "window ending exactly AT the watermark was not emitted — " +
        "Spark's append emission rule changed; update q70's oracle filter")
    assert(emitted.contains("2025-01-01 12:30:00"))
    assert(!emitted.contains("2025-01-01 23:00:00")) // above the watermark
  }

  test("event-time timeout rule: fires iff timeout < watermark, STRICT at the boundary") {
    // q74's DuckDB oracle hard-codes the flatMapGroupsWithState timeout
    // semantics under AvailableNow: the trailing no-data batch runs with
    // watermark = ms-truncated max event time - gap, and a pending session
    // times out iff its timeout timestamp (session_end + gap) is STRICTLY
    // below that watermark. This pins both facts with a crafted file:
    // user 5's timeout (08:30) is clearly below the final wm (10:30) -> its
    // emission proves the no-data batch fires timeouts at all; user 10's
    // timeout is exactly AT the wm -> its absence pins strict '<'. If a
    // Spark upgrade flips either rule, this fails readably instead of as a
    // q74 gate mismatch.
    val dir = Files.createTempDirectory("graft_anprobe").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (5L, ts("2025-01-01 08:00:00"), "click", 1.0),   // timeout 08:30 < wm
      (10L, ts("2025-01-01 10:00:00"), "click", 1.0),  // timeout 10:30 == wm
      (20L, ts("2025-01-01 11:00:00"), "click", 1.0))  // max ts; timeout > wm
      .toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val events = spark.readStream.schema(schema).parquet(s"$dir/in")
      .as[graft.streaming.Sessionize.Event]
    val sessions = graft.streaming.Sessionize.streamingSessions(events, gapMinutes = 30)
    val sink = "an_probe_sink"
    val q = sessions.toDF().select(col("user_id"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).as[Long].collect().toSet
    spark.catalog.dropTempView(sink)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    assert(got.contains(5L),
      "no-data batch did not fire event-time timeouts under AvailableNow — " +
        "q74's oracle (last sessions below the watermark emitted) is invalid")
    assert(!got.contains(10L),
      "timeout exactly AT the watermark fired — Spark's timeout rule went " +
        "inclusive; flip q74's oracle filter to <=")
    assert(!got.contains(20L)) // above the watermark: state survives, unemitted
  }

  test("dropDuplicatesWithinWatermark: dedup within delay, bounded state, re-admission after eviction") {
    // q75's operator contract: a duplicate arriving while its key's state is
    // live (watermark has not passed first-seen + delay) is dropped; once the
    // watermark evicts the key, the SAME content re-emits — that bounded
    // state is exactly what distinguishes this from an unbounded streaming
    // dropDuplicates, and why it scales. (q75's gate only exercises the
    // single-batch form where nothing is evicted.)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val sink = "ddww_sink"
    val q = mem.toDF().toDF("k", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"), col("ts").cast("string").as("ts"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    mem.addData(("a", ts("2025-01-01 10:00:00")))
    q.processAllAvailable() // emits a; wm -> 09:00
    mem.addData(("a", ts("2025-01-01 10:30:00")), ("b", ts("2025-01-01 12:00:00")))
    q.processAllAvailable() // dup a dropped (state live); b emits; wm -> 11:00 evicts a
    mem.addData(("a", ts("2025-01-01 12:30:00")))
    q.processAllAvailable() // a re-admitted: its state was evicted
    val got = spark.table(sink).collect().map(r => (r.getString(0), r.getString(1)))
    q.stop()
    spark.catalog.dropTempView(sink)
    assert(got.count(_._1 == "a") == 2, s"expected a emitted twice, got ${got.toSeq}")
    assert(got.count(_._1 == "b") == 1)
    assert(!got.contains(("a", "2025-01-01 10:30:00"))) // the in-state dup was dropped
  }

  test("streaming upsert: UPDATE mode re-emits a key's winner only in batches it receives data") {
    // q112's emission pin: mapGroupsWithState in update mode emits one row
    // per key per batch WHERE THE KEY SAW DATA, carrying the post-merge
    // winner; quiet keys are not re-emitted; a stale (lower-version) late
    // arrival re-emits the UNCHANGED winner — state keeps the max.
    import graft.streaming.UpsertStream
    import graft.streaming.UpsertStream.DocVersion
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocVersion]
    val sink = "upsert_sink"
    val q = UpsertStream.latestWins(mem.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    mem.addData(
      DocVersion(1L, "t1", "en", "s", 10L, 1L, 0),
      DocVersion(2L, "t2", "en", "s", 20L, 1L, 0))
    q.processAllAvailable() // batch 1: both keys emit their v1
    mem.addData(DocVersion(2L, "t2b", "xx", "s", 21L, 2L, 1))
    q.processAllAvailable() // batch 2: only key 2 re-emits, now at v2
    mem.addData(DocVersion(2L, "t2-stale", "fr", "s", 22L, 1L, 0))
    q.processAllAvailable() // batch 3: stale arrival -> winner unchanged (v2)
    val got = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(5)))
    q.stop()
    spark.catalog.dropTempView(sink)
    assert(got.count(_._1 == 1L) == 1, s"quiet key re-emitted: ${got.toSeq}")
    assert(got.count(_._1 == 2L) == 3, s"expected 3 emissions for key 2: ${got.toSeq}")
    val key2 = got.filter(_._1 == 2L).map(x => (x._2, x._3))
    assert(key2.count(_ == (("t2b", 2L))) == 2,
      s"post-merge winner must survive the stale arrival: ${got.toSeq}")
    assert(!key2.contains(("t2-stale", 1L)))
  }

  test("stream-static semi join is stateless: matches emit in-batch, non-matches vanish, no watermark needed") {
    // q100's join mode: the static side broadcasts exactly as in batch and
    // the join keeps NO state — a later static-side change cannot
    // retroactively match (static is re-read per batch, but emitted rows
    // are final), and rows emit in the same micro-batch they arrive
    implicit val sqlCtx = spark.sqlContext
    val statics = Seq(1L, 3L).toDF("k")
    val mem = MemoryStream[Long]
    val sink = "ss_semi_sink"
    val q = mem.toDF().toDF("k")
      .join(broadcast(statics), Seq("k"), "left_semi")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    mem.addData(1L, 2L)
    q.processAllAvailable()
    val afterB1 = spark.table(sink).collect().map(_.getLong(0)).toSeq
    mem.addData(3L, 4L)
    q.processAllAvailable()
    val afterB2 = spark.table(sink).collect().map(_.getLong(0)).toSeq.sorted
    q.stop()
    spark.catalog.dropTempView(sink)
    assert(afterB1 == Seq(1L), s"batch-1 emission wrong: $afterB1")
    assert(afterB2 == Seq(1L, 3L), s"batch-2 emission wrong: $afterB2")
  }

  test("left-outer interval join: null-emission iff join-window end strictly below the GLOBAL min watermark") {
    // q81's oracle hard-codes three facts about stream-stream left-outer
    // emission under AvailableNow, each pinned by one crafted row:
    //  - the eviction bound is the JOIN-CONDITION window end (click_ts +
    //    interval), not click_ts + the watermark delay (click 3 emits, a
    //    delay-based rule would also emit click 2);
    //  - the boundary is STRICT (click 2's bound == wm is withheld);
    //  - the watermark is the GLOBAL MIN across both sides' watermark
    //    nodes (click 7 is below the click-side wm 13:00 but above the
    //    global 11:00 -> withheld).
    // delay 1h, interval 2h; max click 14:00 / max purchase 12:00 ->
    // global wm = min(13:00, 11:00) = 11:00.
    val dir = Files.createTempDirectory("graft_ojpin").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, 100L, "click", ts("2025-01-01 07:00:00")),    // matched by 6
      (2L, 200L, "click", ts("2025-01-01 09:00:00")),    // bound 11:00 == wm: HOLD
      (3L, 300L, "click", ts("2025-01-01 08:59:00")),    // bound 10:59 < wm: EMIT null
      (7L, 700L, "click", ts("2025-01-01 10:30:00")),    // bound 12:30 < click-side wm only: HOLD
      (4L, 400L, "click", ts("2025-01-01 14:00:00")),    // click max; open
      (5L, 400L, "purchase", ts("2025-01-01 12:00:00")), // purchase max; not in click 4's window
      (6L, 100L, "purchase", ts("2025-01-01 08:30:00"))  // matches click 1
    ).toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def side() = spark.readStream.schema(schema).parquet(s"$dir/in")
    val clicks = side().where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = side().where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val sink = "oj_pin_sink"
    val q = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOUR"),
        "left_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    spark.catalog.dropTempView(sink)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    assert(got == Set((1L, 6L), (3L, -1L)),
      s"outer-emission rule changed (got $got) — update q81's oracle filter")
  }

  test("windowed event aggregation with watermark (streaming rollup)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.windowedCounts(df, "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (ts("2025-01-01 10:05:00"), "click", 1.0),
      (ts("2025-01-01 10:45:00"), "click", 2.0),
      (ts("2025-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("2025-01-01 10:00:00", "click", 2L)))
    assert(rows.contains(("2025-01-01 11:00:00", "view", 1L)))
  }

  test("streaming IVF assignment ≡ batch (stateless map-side projection, q119)") {
    // the online index-maintenance leg: a stateless transform under
    // AvailableNow must emit every input row exactly once with the same
    // cell the batch coarse quantizer assigns
    val dir = Files.createTempDirectory("graft_ivfstream").toString
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-0.1f, 0.9f)),
      (5L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    emb.coalesce(1).write.parquet(s"$dir/in")
    val cents = Ann.sampleCentroids(emb, "vec_id", "embedding", 2)
    val batch = Ann.withIvfAssignment(emb, "embedding", cents)
      .select("vec_id", "ivf_cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val schema = spark.read.parquet(s"$dir/in").schema
    val sink = "ivf_stream_sink"
    val q = spark.readStream.schema(schema).parquet(s"$dir/in")
      .transform(df => Ann.withIvfAssignment(df, "embedding", cents))
      .select(col("vec_id"), col("ivf_cell"))
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    spark.catalog.dropTempView(sink)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    assert(streamed == batch)
    assert(streamed.size == 5, "every vector assigned exactly once")
  }

  test("streaming session_window append: emission rule pinned (end <= final watermark?)") {
    import org.apache.spark.sql.functions.{col, session_window, count, lit}
    val dir = Files.createTempDirectory("graft-sesswin").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // gap 30 min, watermark delay 1 h; max ts 06:00:00 -> final wm 05:00:00
    // session A: [00:00, 00:10] -> end 00:40  (< wm: must emit)
    // session B: [04:00, 04:30] -> end 05:00  (== wm: pins <= vs <)
    // session C: [06:00]        -> end 06:30  (> wm: must be withheld)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 04:00:00")), (1L, ts("2024-01-01 04:30:00")),
      (1L, ts("2024-01-01 06:00:00"))
    ).toDF("user_id", "ts")
    ev.coalesce(1).write.parquet(s"$dir/in")
    val schema = ev.schema
    val sink = "sesswin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n"))
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      .toSet
    spark.catalog.dropTempView(sink)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // the pin: A emits; C withheld; B's presence decides the boundary rule
    assert(got.exists(_._1.startsWith("2024-01-01 00:00")), s"A missing: $got")
    assert(!got.exists(_._1.startsWith("2024-01-01 06:00")), s"C leaked: $got")
    // RECORD the boundary outcome (assert whichever holds so drift fails loudly)
    val bEmitted = got.exists(_._1.startsWith("2024-01-01 04:00"))
    assert(bEmitted, // Spark evicts on end <= watermark in append mode
      s"session ending exactly at the watermark was withheld: $got")
  }

  test("full-outer interval join: purchase-side null-extension boundary pinned") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-fullouter").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // clicks max 12:00, purchases max 13:00 -> global min wm = 11:00.
    // unmatched purchases: at 11:00 EXACTLY (boundary), at 10:59:59
    // (strictly below -> must emit), at 12:30 (above -> withheld).
    val ev = Seq(
      (1L, 100L, "click", ts("2024-01-01 12:00:00")),
      (2L, 200L, "purchase", ts("2024-01-01 13:00:00")),
      (3L, 300L, "purchase", ts("2024-01-01 11:00:00")),
      (4L, 400L, "purchase", ts("2024-01-01 10:59:59")),
      (5L, 500L, "purchase", ts("2024-01-01 12:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    ev.coalesce(1).write.parquet(s"$dir/in")
    val schema = ev.schema
    val sink = "fullouter_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val side = () => spark.readStream.schema(schema).parquet(s"$dir/in")
    val clicks = side().where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = side().where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val q = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"),
        "full_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    spark.catalog.dropTempView(sink)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    assert(got.contains((None, Some(4L))), s"strictly-below purchase missing: $got")
    assert(!got.contains((None, Some(5L))), s"above-wm purchase leaked: $got")
    assert(!got.contains((None, Some(2L))), s"max-ts purchase leaked: $got")
    // THE PIN: purchase with event time exactly AT the watermark
    assert(!got.contains((None, Some(3L))), // strict <: boundary row withheld
      s"boundary purchase emitted — the oracle's strict < is wrong: $got")
  }

  test("UpsertSink.accumulateBatch: counts sum, min/max fold, new keys appear") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-aggsink").toString
    val table = s"$dir/t"
    def acc(rows: Seq[(String, Long, Double, Double)]): Unit =
      UpsertSink.accumulateBatch(table,
        rows.toDF("k", "n", "mn", "mx"), Seq("k"),
        sumCols = Seq("n"), minCols = Seq("mn"), maxCols = Seq("mx"))
    def snap(): Map[String, (Long, Double, Double)] =
      spark.read.parquet(table).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    acc(Seq(("a", 3L, 1.0, 5.0), ("b", 1L, 9.0, 9.0)))
    acc(Seq(("a", 2L, 0.5, 4.0), ("c", 7L, 2.0, 3.0)))
    assert(snap() == Map(
      "a" -> ((5L, 0.5, 5.0)),   // counts added, min tightened, max kept
      "b" -> ((1L, 9.0, 9.0)),   // untouched key survives the merge
      "c" -> ((7L, 2.0, 3.0))))  // new key appears
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink.compactBatch: cross-batch merge, stored-key comparison, redelivery idempotence") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsertsink").toString
    val table = s"$dir/table"
    def snap(): Map[Long, (String, Long, Int)] =
      spark.read.parquet(table).collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("v"), r.getAs[Long]("version"), r.getAs[Int]("prio"))))
        .toMap
    val b1 = Seq((1L, "a1", 1L, 0), (2L, "b1", 1L, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, b1, Seq("k"), "version", "prio")
    assert(snap() == Map(1L -> (("a1", 1L, 0)), 2L -> (("b1", 1L, 0))))
    // batch 2: higher version for k=1, LOWER version for k=2 (must lose
    // against the winner STORED in the table — the cross-batch comparison)
    val b2 = Seq((1L, "a2", 2L, 0), (2L, "b0", 0L, 5)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, b2, Seq("k"), "version", "prio")
    assert(snap() == Map(1L -> (("a2", 2L, 0)), 2L -> (("b1", 1L, 0))))
    // at-least-once redelivery of an already-merged batch: no change
    UpsertSink.compactBatch(table, b2, Seq("k"), "version", "prio")
    assert(snap() == Map(1L -> (("a2", 2L, 0)), 2L -> (("b1", 1L, 0))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink: crash recovery — a partial (no _SUCCESS) next version is ignored and overwritten") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsert-crash").toString
    val table = s"$dir/table"
    val b1 = Seq((1L, "a1", 1L, 0), (2L, "b1", 1L, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, b1, Seq("k"), "version", "prio")
    // simulate a crash mid-write of v2: directory with data-ish junk but
    // no _SUCCESS marker — recovery must treat v1 as current, and the
    // replayed batch must overwrite the partial dir cleanly
    val partial = new java.io.File(s"${table}__v2")
    assert(partial.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${table}__v2/part-junk.parquet"), "not parquet")
    assert(UpsertSink.snapshotPath(spark, table).get.endsWith("__v1"),
      "partial v2 must not be the snapshot anchor")
    val b2 = Seq((1L, "a2", 2L, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, b2, Seq("k"), "version", "prio")
    val got = spark.read.parquet(table).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(got == Map(1L -> "a2", 2L -> "b1"), s"recovered merge wrong: $got")
    assert(UpsertSink.snapshotPath(spark, table).get.endsWith("__v2"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink.snapshot: pinned reader survives one concurrent merge; retention ages out at two") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsert-snap").toString
    val table = s"$dir/table"
    def batch(ver: Long, tag: String) =
      Seq((1L, tag, ver, 0), (2L, tag, ver, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, batch(1L, "b1"), Seq("k"), "version", "prio")
    val pinned = UpsertSink.snapshot(spark, table) // pins the v1 directory
    UpsertSink.compactBatch(table, batch(2L, "b2"), Seq("k"), "version", "prio")
    // the pinned reader still sees its full pre-merge content AFTER the swap
    val pinnedRows = pinned.collect().map(_.getAs[String]("v")).toSet
    assert(pinnedRows == Set("b1"), s"snapshot torn by concurrent merge: $pinnedRows")
    // while the plain path already serves the new version
    val plain = spark.read.parquet(table).collect().map(_.getAs[String]("v")).toSet
    assert(plain == Set("b2"), s"plain path stale: $plain")
    // retention: v1 survives the v2 publish, ages out at the v3 publish
    assert(new java.io.File(s"${table}__v1").exists(), "retention window broken")
    UpsertSink.compactBatch(table, batch(3L, "b3"), Seq("k"), "version", "prio")
    assert(!new java.io.File(s"${table}__v1").exists(), "v1 not reclaimed at v3")
    assert(new java.io.File(s"${table}__v2").exists(), "v2 reclaimed too early")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink retainVersions: a snapshot survives N-1 publishes, then ages out") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsert-retain").toString
    val table = s"$dir/table"
    def batch(ver: Long, tag: String) =
      Seq((1L, tag, ver, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, batch(1L, "b1"), Seq("k"), "version",
      "prio", retainVersions = 3)
    val pinned = UpsertSink.snapshot(spark, table) // pins v1
    // TWO subsequent publishes — under the default window v1 would be
    // gone after the second; retainVersions=3 keeps it alive
    UpsertSink.compactBatch(table, batch(2L, "b2"), Seq("k"), "version",
      "prio", retainVersions = 3)
    UpsertSink.compactBatch(table, batch(3L, "b3"), Seq("k"), "version",
      "prio", retainVersions = 3)
    assert(new java.io.File(s"${table}__v1").exists(),
      "v1 reclaimed inside the retention window")
    val held = pinned.collect().map(_.getAs[String]("v")).toSet
    assert(held == Set("b1"), s"long-lived snapshot torn: $held")
    // the third publish pushes v1 out of the window
    UpsertSink.compactBatch(table, batch(4L, "b4"), Seq("k"), "version",
      "prio", retainVersions = 3)
    assert(!new java.io.File(s"${table}__v1").exists(), "v1 outlived the window")
    assert(new java.io.File(s"${table}__v2").exists(), "v2 reclaimed too early")
    val plain = spark.read.parquet(table).collect().map(_.getAs[String]("v")).toSet
    assert(plain == Set("b4"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink time travel: readVersion scans the retained immutable dir") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsert-tt").toString
    val table = s"$dir/table"
    def batch(ver: Long, tag: String) =
      Seq((ver, tag, ver, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, batch(1L, "b1"), Seq("k"), "version",
      "prio", retainVersions = 3)
    UpsertSink.compactBatch(table, batch(2L, "b2"), Seq("k"), "version",
      "prio", retainVersions = 3)
    assert(UpsertSink.versions(spark, table) == Seq(1, 2))
    // v1 = batch 1 alone; v2 = the latest-wins merge of both
    val v1 = UpsertSink.readVersion(spark, table, 1)
      .collect().map(_.getAs[String]("v")).toSet
    assert(v1 == Set("b1"), s"time-travel read of v1 drifted: $v1")
    val v2 = UpsertSink.readVersion(spark, table, 2)
      .collect().map(_.getAs[String]("v")).toSet
    assert(v2 == Set("b1", "b2"))
    // as-of-current == snapshot
    assert(UpsertSink.readVersion(spark, table, 2).collect().toSet ==
      UpsertSink.snapshot(spark, table).collect().toSet)
    // a version that aged out (or never existed) fails LOUDLY, naming what
    // is available
    UpsertSink.compactBatch(table, batch(3L, "b3"), Seq("k"), "version",
      "prio", retainVersions = 2) // shrink window: v1 reclaimed, [2, 3] kept
    val err = intercept[RuntimeException] {
      UpsertSink.readVersion(spark, table, 1)
    }
    assert(err.getMessage.contains("version 1 not retained")
      && err.getMessage.contains("[2, 3]"), err.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("Optimize: compaction is a versioned publish — layout changes, nothing else") {
    import graft.streaming.{Optimize, UpsertSink}
    val dir = Files.createTempDirectory("graft-optimize").toString
    val table = s"$dir/table"
    val rows = (1L to 200L).map(k => (k, s"v$k", 1L, 0))
    UpsertSink.compactBatch(table,
      rows.toDF("k", "v", "version", "prio").repartition(8),
      Seq("k"), "version", "prio")
    val beforeContent = UpsertSink.snapshot(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // a small byte budget SPLITS (the restore direction of the same op)
    val (v2, _, nSplit) = Optimize.optimize(spark, table,
      targetBytes = 1024L, retainVersions = 3)
    assert(v2 == 2 && nSplit > 1, s"1 KiB budget should split, got $nSplit")
    val pinned = UpsertSink.snapshot(spark, table) // pins v2 across OPTIMIZE
    // the big budget collapses the small files back to one
    val (v3, nBefore3, nAfter3) = Optimize.optimize(spark, table,
      Long.MaxValue, retainVersions = 3)
    assert(v3 == 3 && nBefore3 == nSplit && nAfter3 == 1,
      s"expected $nSplit->1 files at v3, got v$v3 $nBefore3->$nAfter3")
    // content is identical through both rewrites
    val after = UpsertSink.snapshot(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == beforeContent, "compaction changed content")
    // snapshot isolation: the pre-compaction reader still sees v2 intact
    val held = pinned.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(held == beforeContent, "pinned snapshot torn by OPTIMIZE")
    // time travel still reaches the original pre-compaction version
    assert(UpsertSink.readVersion(spark, table, 1).count() == 200L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("UpsertSink: plain-path reads across concurrent swaps are never torn") {
    import graft.streaming.UpsertSink
    val dir = Files.createTempDirectory("graft-upsert-iso").toString
    val table = s"$dir/table"
    val keys = (1L to 4L)
    def batch(i: Int) =
      keys.map(k => (k, s"b$i", i.toLong, 0)).toDF("k", "v", "version", "prio")
    UpsertSink.compactBatch(table, batch(1), Seq("k"), "version", "prio")
    val valid = (1 to 6).map(i => keys.map(k => (k, s"b$i")).toSet)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    val retried = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        try {
          val got = spark.read.parquet(table).collect()
            .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
          if (valid.contains(got)) ok.incrementAndGet()
          else torn.set(got.toString) // a mix of versions or a partial set
        } catch {
          // the documented plain-path contract: an overlapping swap may
          // fail a read (stale listing) — readers retry or use snapshot()
          case _: Throwable => retried.incrementAndGet()
        }
      }
    })
    reader.start()
    (2 to 6).foreach(i => UpsertSink.compactBatch(table, batch(i), Seq("k"), "version", "prio"))
    stop.set(true)
    reader.join(60000)
    assert(torn.get() == null, s"torn plain-path read observed: ${torn.get()}")
    assert(ok.get() > 0, "reader never completed a successful read")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
