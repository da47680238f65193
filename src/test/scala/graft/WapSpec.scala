package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.streaming.{UpsertSink, Wap}

class WapSpec extends SparkSpec {
  import spark.implicits._

  private def rules = Seq(
    Checks.Predicate("v_nonneg", col("v") >= 0),
    Checks.Unique("unique_k", Seq("k")))

  test("dirty batch never publishes: snapshot stays at the previous version") {
    val tmp = java.nio.file.Files.createTempDirectory("wapspec").toString
    val table = s"$tmp/t"
    val b1 = Seq((1L, 10L, 1, 0), (2L, 20L, 1, 0)).toDF("k", "v", "version", "prio")
    val a1 = Wap.publishIfClean(table, b1, Seq("k"), "version", "prio", rules)
    assert(a1.collect().forall(_.getAs[Boolean]("published")))
    val snap1 = UpsertSink.snapshotPath(spark, table).get

    // dirty: negative v on a NEW key, plus an update to k=1
    val b2 = Seq((1L, 11L, 2, 0), (3L, -5L, 2, 0)).toDF("k", "v", "version", "prio")
    val a2 = Wap.publishIfClean(table, b2, Seq("k"), "version", "prio", rules)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!a2("v_nonneg").getAs[Boolean]("pass"))
    assert(a2.values.forall(!_.getAs[Boolean]("published")))
    // the table is bit-for-bit the previous version: same snapshot dir,
    // and the k=1 update from the rejected batch is NOT visible
    assert(UpsertSink.snapshotPath(spark, table).get == snap1)
    val vs = spark.read.parquet(table).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vs == Map(1L -> 10L, 2L -> 20L))

    // a repaired batch then publishes and merges latest-wins
    val b3 = Seq((1L, 11L, 3, 0), (3L, 5L, 3, 0)).toDF("k", "v", "version", "prio")
    val a3 = Wap.publishIfClean(table, b3, Seq("k"), "version", "prio", rules)
    assert(a3.collect().forall(_.getAs[Boolean]("published")))
    val vs3 = spark.read.parquet(table).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vs3 == Map(1L -> 11L, 2L -> 20L, 3L -> 5L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
