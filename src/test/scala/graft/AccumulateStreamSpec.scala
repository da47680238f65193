package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{PercentileStream, SampleStream, UpsertSink}

/** Merge-closure properties of the round-11 accumulate family:
  * value-dictionary percentiles and bottom-k sampling.
  */
class AccumulateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_accum").toString + "/state"

  private def rows(n: Int): DataFrame = {
    val rng = new scala.util.Random(11)
    (1 to n).map(i => (i.toLong, s"g${i % 3}", rng.nextInt(40).toLong))
      .toDF("id", "g", "v")
  }

  test("percentiles: any slicing lands on the batch dictionary exactly") {
    val df = rows(600)
    def run(slices: Seq[DataFrame]): Array[(String, Long, Long, Long, Long, Long)] = {
      val t = tmpTable()
      slices.foreach(sl => PercentileStream.accumulateBatch(t, sl, "g", "v"))
      PercentileStream.percentiles(spark, t, "g", "v", Seq(50, 90, 99))
        .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }
    val bySeven = run((0 to 6).map(i => df.where($"id" % 7 === i)))
    val byTwo = run(Seq(df.where($"id" % 2 === 0), df.where($"id" % 2 === 1)))
    val whole = run(Seq(df))
    assert(bySeven.toSeq === whole.toSeq)
    assert(byTwo.toSeq === whole.toSeq)
  }

  test("percentiles: readout equals the brute-force order statistic") {
    val t = tmpTable()
    val df = rows(500)
    PercentileStream.accumulateBatch(t, df, "g", "v")
    val got = PercentileStream.percentiles(spark, t, "g", "v", Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byG = df.collect().map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byG.foreach { case (g, vs) =>
      def disc(p: Int): Long = vs((p * vs.length + 99) / 100 - 1)
      val (p50, p90, p99, n) = got(g)
      assert((p50, p90, p99) === (disc(50), disc(90), disc(99)), s"group $g")
      assert(n === vs.length.toLong)
    }
  }

  test("percentiles: state is dictionary-bounded, not row-bounded") {
    val t = tmpTable()
    // 10k rows over 5 distinct values in one group -> 5 state rows
    val df = (1 to 10000).map(i => (i.toLong, "g", (i % 5).toLong))
      .toDF("id", "g", "v")
    PercentileStream.accumulateBatch(t, df, "g", "v")
    assert(UpsertSink.snapshot(spark, t).count() === 5L)
    val nd = PercentileStream.percentiles(spark, t, "g", "v", Seq(50))
      .select("n_distinct").head().getLong(0)
    assert(nd === 5L)
  }

  test("sample: streamed bottom-k equals the batch bottom-k bit-for-bit") {
    val df = rows(400)
    val t = tmpTable()
    (0 to 4).foreach { i =>
      SampleStream.accumulateBatch(t, df.where($"id" % 5 === i), "g", "id", k = 7)
    }
    val streamed = UpsertSink.snapshot(spark, t)
      .orderBy("g", "u", "id").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
    val t2 = tmpTable()
    SampleStream.accumulateBatch(t2, df, "g", "id", k = 7)
    val batch = UpsertSink.snapshot(spark, t2)
      .orderBy("g", "u", "id").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.groupBy(_._1).forall(_._2.length == 7))
  }

  test("sample: redelivered batches are a no-op (id-keyed membership)") {
    val df = rows(300)
    val t = tmpTable()
    val sl = Seq(df.where($"id" % 2 === 0), df.where($"id" % 2 === 1))
    sl.foreach(SampleStream.accumulateBatch(t, _, "g", "id", k = 9))
    val before = UpsertSink.snapshot(spark, t)
      .orderBy("g", "id").collect().toSeq
    SampleStream.accumulateBatch(t, sl.head, "g", "id", k = 9)
    SampleStream.accumulateBatch(t, sl.head, "g", "id", k = 9)
    val after = UpsertSink.snapshot(spark, t)
      .orderBy("g", "id").collect().toSeq
    assert(after === before)
  }

  test("sample: groups smaller than k keep everything, never pad") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "g")
    val t = tmpTable()
    SampleStream.accumulateBatch(t, df, "g", "id", k = 50)
    assert(UpsertSink.snapshot(spark, t).count() === 2L)
  }

  // --- batch-id fencing: exactly-once for the sum-merge accumulates ------

  test("fence: redelivered slices are a no-op for a SUM-merge accumulate") {
    // q278's redelivery protocol aimed at the family member that is NOT
    // idempotent by construction: counts re-add unless fenced. Deliver
    // three slices with their batch ids, then replay the last (the crash
    // shape) and an older one — the readout must still land on the batch
    // oracle, i.e. equal the single-delivery run.
    val df = rows(600)
    def slice(i: Int) = df.where($"id" % 3 === i)
    val t = tmpTable()
    (0 to 2).foreach(i => PercentileStream.accumulateBatch(
      t, slice(i), "g", "v", batchId = Some(i.toLong)))
    val once = PercentileStream.percentiles(spark, t, "g", "v", Seq(50, 99))
      .orderBy("g").collect().toSeq
    PercentileStream.accumulateBatch(t, slice(2), "g", "v", batchId = Some(2L))
    PercentileStream.accumulateBatch(t, slice(1), "g", "v", batchId = Some(1L))
    val after = PercentileStream.percentiles(spark, t, "g", "v", Seq(50, 99))
      .orderBy("g").collect().toSeq
    assert(after === once, "fenced redelivery must not re-add any count")
    assert(UpsertSink.foldedBatchMax(spark, t) === Some(2L))
    // and the control: the SAME redelivery UNfenced visibly corrupts sums
    val t2 = tmpTable()
    (0 to 2).foreach(i => PercentileStream.accumulateBatch(t2, slice(i), "g", "v"))
    PercentileStream.accumulateBatch(t2, slice(1), "g", "v")
    val nTotal = UpsertSink.snapshot(spark, t2).agg(sum("cnt")).head.getLong(0)
    assert(nTotal > 600L, "unfenced redelivery re-adds (the caveat is real)")
  }

  test("fence: the mark is recorded atomically with the published state") {
    // the fence sidecar rides the version dir itself: the CURRENT complete
    // version always answers foldedBatchMax consistently with its data,
    // and an unfenced publish in between carries the mark forward
    val df = rows(90)
    val t = tmpTable()
    PercentileStream.accumulateBatch(t, df, "g", "v", batchId = Some(7L))
    assert(UpsertSink.foldedBatchMax(spark, t) === Some(7L))
    assert(UpsertSink.alreadyFolded(spark, t, 7L))
    assert(UpsertSink.alreadyFolded(spark, t, 3L), "older ids fence too")
    assert(!UpsertSink.alreadyFolded(spark, t, 8L))
    // unfenced fold (no batchId): state advances, mark carried forward
    PercentileStream.accumulateBatch(t, df, "g", "v")
    assert(UpsertSink.foldedBatchMax(spark, t) === Some(7L))
  }

  test("fence: two-table accumulate replays a torn pair consistently") {
    // TransitionStream fences each table independently; simulate the
    // crash-between-publishes by folding counts WITH the id via a direct
    // sum-merge, then verify a fenced member re-run skips only its own leg
    import graft.streaming.TransitionStream
    val dir = java.nio.file.Files.createTempDirectory("graft_tstream").toString
    val b1 = Seq((1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val b2 = Seq((1L, 30L, 102L, "c")).toDF("user_id", "ts", "event_id", "event_type")
    TransitionStream.accumulateBatch(dir, b1, "user_id", "ts", "event_id",
      "event_type", batchId = Some(0L))
    TransitionStream.accumulateBatch(dir, b2, "user_id", "ts", "event_id",
      "event_type", batchId = Some(1L))
    val once = TransitionStream.matrix(spark, dir)
      .orderBy("from_state", "to_state").collect().toSeq
    // full redelivery of the last batch: both legs fenced, nothing moves
    TransitionStream.accumulateBatch(dir, b2, "user_id", "ts", "event_id",
      "event_type", batchId = Some(1L))
    val after = TransitionStream.matrix(spark, dir)
      .orderBy("from_state", "to_state").collect().toSeq
    assert(after === once)
    assert(once.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "c")), "the junction transition b->c is counted once")
  }

  // --- epoch scoping: the fresh-checkpoint restart hole -------------------

  test("fence: epochs match exactly; a new epoch's ids are never fenced by an old one's") {
    val df = rows(90)
    val t = tmpTable()
    PercentileStream.accumulateBatch(t, df, "g", "v",
      batchId = Some(5L), epoch = Some("cpA"))
    assert(UpsertSink.alreadyFolded(spark, t, 5L, Some("cpA")))
    assert(UpsertSink.alreadyFolded(spark, t, 3L, Some("cpA")))
    assert(!UpsertSink.alreadyFolded(spark, t, 5L, Some("cpB")),
      "a different epoch must not fence")
    assert(!UpsertSink.alreadyFolded(spark, t, 5L),
      "an epoch-less check must not match an epoch-scoped record")
    assert(UpsertSink.foldedFence(spark, t) ===
      Some(UpsertSink.FoldFence(5L, Some("cpA"))))
    // an unfenced fold in between carries the epoch-scoped record forward
    PercentileStream.accumulateBatch(t, df, "g", "v")
    assert(UpsertSink.foldedFence(spark, t) ===
      Some(UpsertSink.FoldFence(5L, Some("cpA"))))
    // a fold under a NEW epoch replaces the record outright
    PercentileStream.accumulateBatch(t, df, "g", "v",
      batchId = Some(0L), epoch = Some("cpB"))
    assert(UpsertSink.foldedFence(spark, t) ===
      Some(UpsertSink.FoldFence(0L, Some("cpB"))))
    assert(!UpsertSink.alreadyFolded(spark, t, 5L, Some("cpA")),
      "the old epoch's ids are dead once a new epoch folds")
    // a line break in the epoch would truncate the line-oriented sidecar
    // (the stored epoch would never match again) — rejected at write time
    intercept[IllegalArgumentException] {
      PercentileStream.accumulateBatch(t, df, "g", "v",
        batchId = Some(9L), epoch = Some("bad\nepoch"))
    }
  }

  test("fence: ADOPTING epochs on a legacy table keeps fencing the replayed batch") {
    // upgrade path: a pre-epoch deployment folded batches with ids only;
    // the operator starts passing checkpointEpoch on the SAME unwiped
    // checkpoint. Ids stayed monotone (same single writer), so the
    // replayed last batch MUST still fence against the legacy record —
    // an exact-epoch-only rule would silently double-fold it here.
    val df = rows(300)
    def slice(i: Int) = df.where($"id" % 2 === i)
    val t = tmpTable()
    PercentileStream.accumulateBatch(t, slice(0), "g", "v", batchId = Some(0L))
    PercentileStream.accumulateBatch(t, slice(1), "g", "v", batchId = Some(1L))
    val once = PercentileStream.percentiles(spark, t, "g", "v", Seq(50))
      .orderBy("g").collect().toSeq
    // crash-replay of batch 1 arrives from the UPGRADED (epoch-passing)
    // binary: must be a no-op, and the record upgrades to the epoch
    PercentileStream.accumulateBatch(t, slice(1), "g", "v",
      batchId = Some(1L), epoch = Some("cpU"))
    assert(PercentileStream.percentiles(spark, t, "g", "v", Seq(50))
      .orderBy("g").collect().toSeq === once,
      "legacy record must fence the upgraded caller's replay")
    // a genuinely new batch from the upgraded caller folds and upgrades
    PercentileStream.accumulateBatch(t, slice(0), "g", "v",
      batchId = Some(2L), epoch = Some("cpU"))
    assert(UpsertSink.foldedFence(spark, t) ===
      Some(UpsertSink.FoldFence(2L, Some("cpU"))))
    // the reverse never holds: an epoch-less caller is not fenced by an
    // epoch-scoped record (it cannot prove the same lineage)
    assert(!UpsertSink.alreadyFolded(spark, t, 2L))
  }

  test("fence: a fresh-checkpoint restart (ids from 0) still lands on the batch oracle") {
    // the exact recovery event the epoch exists for: deliver two batches
    // (ids 0, 1) under checkpoint A, lose the checkpoint, deliver the
    // remaining slice under fresh checkpoint B whose ids restart at 0 —
    // id-only fencing would read B's first batch as already-folded and
    // silently drop it; epoch-scoped fencing folds it
    val df = rows(600)
    def slice(i: Int) = df.where($"id" % 3 === i)
    def read(t: String) =
      PercentileStream.percentiles(spark, t, "g", "v", Seq(50, 99))
        .orderBy("g").collect().toSeq
    val oracle = { // single-delivery truth
      val t0 = tmpTable()
      PercentileStream.accumulateBatch(t0, df, "g", "v")
      read(t0)
    }
    val t = tmpTable()
    PercentileStream.accumulateBatch(t, slice(0), "g", "v",
      batchId = Some(0L), epoch = Some("cpA"))
    PercentileStream.accumulateBatch(t, slice(1), "g", "v",
      batchId = Some(1L), epoch = Some("cpA"))
    // crash-replay of the last batch before the wipe: fenced, a no-op
    PercentileStream.accumulateBatch(t, slice(1), "g", "v",
      batchId = Some(1L), epoch = Some("cpA"))
    // checkpoint wiped; the restarted query's first batch carries id 0
    PercentileStream.accumulateBatch(t, slice(2), "g", "v",
      batchId = Some(0L), epoch = Some("cpB"))
    assert(read(t) === oracle,
      "the fresh-checkpoint batch must fold (id-only fencing would drop it)")
    // and the new epoch's own redelivery protocol keeps working
    PercentileStream.accumulateBatch(t, slice(2), "g", "v",
      batchId = Some(0L), epoch = Some("cpB"))
    assert(read(t) === oracle, "within-epoch redelivery is still a no-op")
  }

  test("checkpointEpoch: stable across restarts of one checkpoint, regenerated on a wipe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("graft_cp").toString + "/cp"
    val t = tmpTable()
    def start(mem: MemoryStream[(String, Long)]) =
      mem.toDF().toDF("g", "v").writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (b: DataFrame, id: Long) =>
          PercentileStream.accumulateBatch(t, b, "g", "v",
            batchId = Some(id),
            epoch = UpsertSink.checkpointEpoch(spark, cp))
        }.start()
    assert(UpsertSink.checkpointEpoch(spark, cp).isEmpty,
      "no epoch before the query ever started")
    val mem = MemoryStream[(String, Long)]
    val q1 = start(mem)
    mem.addData(("a", 1L), ("a", 3L))
    q1.processAllAvailable(); q1.stop()
    val e1 = UpsertSink.checkpointEpoch(spark, cp)
    assert(e1.nonEmpty, "metadata written on first start")
    // restart on the SAME checkpoint (same source): epoch unchanged,
    // batch ids continue monotonically, fencing keeps working
    val q2 = start(mem)
    mem.addData(("b", 5L))
    q2.processAllAvailable(); q2.stop()
    assert(UpsertSink.checkpointEpoch(spark, cp) === e1,
      "same checkpoint => same epoch across restarts")
    // wipe: the id-restart event — a fresh query id must appear and the
    // new epoch's batch 0 must fold despite the stored higher id mark
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
    val mem2 = MemoryStream[(String, Long)]
    val q3 = start(mem2)
    mem2.addData(("c", 7L))
    q3.processAllAvailable(); q3.stop()
    val e2 = UpsertSink.checkpointEpoch(spark, cp)
    assert(e2.nonEmpty && e2 != e1, "wiped checkpoint => new epoch")
    // all four rows must be in the state: the wiped-restart batch (id 0
    // under e2) folded despite the e1 record's higher id
    val total = UpsertSink.snapshot(spark, t).agg(sum("cnt")).head.getLong(0)
    assert(total === 4L,
      s"expected all 4 streamed rows folded across the wipe, got $total")
  }
}
