package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment-drift canary (the round-6 lesson): the driver regenerates
  * /root/testdata between rounds and has already switched events.ts encoding
  * once (TIMESTAMP(NANOS) int64 → timestamp[us]). [[SparkEntry.canonTs]] must
  * accept EVERY encoding the generator has produced so far; when it doesn't,
  * this spec fails with the table + encoding named, instead of 28 opaque
  * PlanAudit failures.
  */
class SchemaPinSpec extends SparkSpec {
  import spark.implicits._

  private val microsUtc = 1704067200000000L // 2024-01-01T00:00:00Z

  test("canonTs: nanos-as-long encoding → micros timestamp, floor division") {
    val df = Seq(
      (1L, microsUtc * 1000L + 999L),  // sub-micro residue must floor away
      (2L, microsUtc * 1000L + 1000L)
    ).toDF("event_id", "ts")
    val out = SparkEntry.canonTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val ts = out.orderBy("event_id").select("ts").as[Timestamp].collect()
    assert(ts(0).getTime === microsUtc / 1000L)     // ms for Timestamp.getTime
    assert(ts(0).getNanos === 0)                    // floored, not rounded up
    assert(ts(1).getNanos === 1000)                 // exactly +1 us survives
  }

  test("canonTs: timestamp[us] (NTZ) parquet round-trip → session-zone timestamp") {
    val dir = Files.createTempDirectory("graft-schemapin").toString
    Seq((1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val rt = spark.read.parquet(dir)
    assert(rt.schema("ts").dataType === TimestampNTZType) // pin the write form
    val out = SparkEntry.canonTs(rt)
    assert(out.schema("ts").dataType === TimestampType)
    // session tz is UTC, so the NTZ wall clock IS the epoch instant
    assert(out.select(unix_micros(col("ts"))).as[Long].head() === microsUtc)
  }

  test("canonTs: already session-zone timestamp is a no-op") {
    val df = Seq((1L, new Timestamp(microsUtc / 1000L))).toDF("event_id", "ts")
    assert(SparkEntry.canonTs(df) eq df)
  }

  test("current testdata events table canonicalizes and analyzes end-to-end") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(s"$dir/events.parquet").exists())
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = SparkEntry.canonTs(spark.read.parquet(s"$dir/events.parquet"))
    assert(ev.schema("ts").dataType === TimestampType)
    // force full analysis + execution of a window over ts — the exact shape
    // that died in round 6
    val n = ev.groupBy(window(col("ts"), "30 minutes")).count().count()
    assert(n > 0)
  }
}
