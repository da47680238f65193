package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.embed.HashingTfEmbedder
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
}
