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

  test("full testdata catalog: every table's Spark-visible schema is the pinned one") {
    // the round-6 lesson applied to the WHOLE catalog: the driver can
    // regenerate /root/testdata with different physical types at any time,
    // and 150 oracles assume these exact Spark-side types. Drift fails
    // HERE with the table and column named, not as a wall of hash
    // mismatches. `ts`/dates are pinned to the CANONICALIZED form (what
    // queries actually consume); events.ts additionally accepts the
    // legacy nanos long (canonTs handles both — the q-suite contract).
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(s"$dir/region.parquet").exists())
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val expected = Map(
      "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int",
      "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"),
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
        "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string"),
      "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
      "region" -> "r_regionkey:int,r_name:string",
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double")
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (table, want) =>
      val raw = spark.read.parquet(s"$dir/$table.parquet")
      // canonicalize like the query surface does: timestamps to the
      // session-zone type (events via canonTs; others read as NTZ get the
      // same cast rule applied per column)
      val df0 = if (table == "events") SparkEntry.canonTs(raw) else raw
      val df = df0.schema.fields.foldLeft(df0) { (d, f) =>
        if (f.dataType == TimestampNTZType)
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        else d
      }
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      if (got == want) None else Some(s"$table:\n  want $want\n  got  $got")
    }
    assert(diffs.isEmpty, "TESTDATA SCHEMA DRIFT —\n" + diffs.mkString("\n"))
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
