package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.scheduler.SchedulingMode
import org.apache.spark.sql.functions._

import graft.api.SemanticSearch
import graft.embed.HashingTfEmbedder

/** Serving-concurrency contracts behind `graft.bench.ServeBench`: FAIR
  * scheduler pools isolate request streams, so a search does not queue
  * FIFO behind an unrelated bulk job's whole task backlog.
  */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  test("FAIR pools: a search in its own pool overtakes a running bulk job") {
    val sc = spark.sparkContext
    assert(sc.getSchedulingMode == SchedulingMode.FAIR,
      s"session must run the FAIR scheduler, got ${sc.getSchedulingMode}")

    val index = Seq.tabulate(64)(i =>
        (i.toLong, s"doc$i", Array.tabulate(8)(j => (i * 8 + j) / 512f)))
      .toDF("ID", "EMBED_STR", "EMBEDDING")
    val searcher = new SemanticSearch(index, HashingTfEmbedder(8))

    // bulk: 64 short tasks on 4 cores ≈ 16 waves. Under FIFO a search
    // submitted later would wait for ALL of them; under FAIR its pool
    // gets slots as the next wave frees.
    val bulkDone = new AtomicBoolean(false)
    val bulkWall = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val bulk = new Thread(() => {
      sc.setLocalProperty("spark.scheduler.pool", "bulk")
      spark.range(64).repartition(64)
        .mapPartitions { it => Thread.sleep(300); it }
        .write.format("noop").mode("overwrite").save()
      bulkWall.set(System.nanoTime() - t0)
      bulkDone.set(true)
    })
    bulk.start()
    Thread.sleep(500) // let the bulk job occupy the cluster first

    sc.setLocalProperty("spark.scheduler.pool", "serve")
    try {
      val s0 = System.nanoTime()
      val got = searcher.topK("doc7", k = 3).collect()
      val serveNanos = System.nanoTime() - s0
      val doneWhenServed = bulkDone.get()
      bulk.join(120000)
      assert(got.length == 3)
      // the sharp FIFO counterfactual: the search must finish well before
      // the bulk backlog drains (FIFO would serialize it after ~16 waves)
      assert(!doneWhenServed,
        "bulk finished before the search — contention never happened, the assertion is vacuous")
      assert(serveNanos < bulkWall.get() / 2,
        f"search took ${serveNanos / 1e9}%.2f s vs bulk ${bulkWall.get() / 1e9}%.2f s — not isolated")
      // both pools actually materialized in the scheduler
      assert(sc.getPoolForName("bulk").isDefined && sc.getPoolForName("serve").isDefined)
    } finally {
      sc.setLocalProperty("spark.scheduler.pool", null)
      bulk.join(120000)
    }
  }
}
