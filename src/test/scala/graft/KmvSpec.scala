package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: sets smaller than k estimate exactly") {
    val df = (1 to 40).map(i => ("a", s"x$i")).toDF("g", "v")
    val sk = Kmv.sketch(df, Seq("g"), col("v"), k = 64)
      .head().getSeq[Long](1)
    assert(sk.length == 40)
    assert(sk == sk.sorted)
    val (ntot, estU, estJ) = Kmv.pairEstimate(sk, sk, 64)
    assert(ntot == 40 && estU == 40.0 && estJ == 1.0)
    // disjoint, union 40 + 20 = 60 < k: still the exact regime
    val other = Kmv.sketch((1 to 20).map(i => ("b", s"y$i")).toDF("g", "v"),
      Seq("g"), col("v"), k = 64).head().getSeq[Long](1)
    val (n2, u2, j2) = Kmv.pairEstimate(sk, other, 64)
    assert(n2 == 60 && u2 == 60.0 && j2 == 0.0)
  }

  test("estimates track truth within sketch error on half-overlapping big sets") {
    val a = (1 to 5000).map(i => ("a", s"v$i"))
    val b = (2501 to 7500).map(i => ("b", s"v$i"))
    val sk = Kmv.sketch((a ++ b).toDF("g", "v"), Seq("g"), col("v"), k = 256)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    assert(sk("a").length == 256 && sk("a") == sk("a").sorted)
    val (_, estU, estJ) = Kmv.pairEstimate(sk("a"), sk("b"), 256)
    // truth: union 7500, jaccard 2500/7500 = 1/3; 1/sqrt(k) ~ 6% rel
    assert(math.abs(estU / 7500.0 - 1.0) < 0.25, s"estU=$estU")
    assert(math.abs(estJ - 1.0 / 3.0) < 0.12, s"estJ=$estJ")
  }

  test("KmvStream accumulate: sliced arrival lands on the batch sketch") {
    val tmp = java.nio.file.Files.createTempDirectory("kmvstream").toString
    val table = s"$tmp/t"
    val all = (1 to 900).map(i => ("g", s"v${i % 450}")).toDF("g", "v")
    val batch = Kmv.sketch(all, Seq("g"), col("v"), k = 64)
      .head().getSeq[Long](1)
    Seq(0, 1).foreach { par =>
      val slice = all.where(length(col("v")) % 2 === par)
      graft.streaming.KmvStream.accumulateBatch(table,
        Kmv.sketch(slice, Seq("g"), col("v"), k = 64), "g", k = 64)
    }
    val acc = spark.read.parquet(table).head().getSeq[Long](1)
    assert(acc == batch, "accumulated sketch must equal the batch sketch")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("sketch is partitioning-independent (map-side heaps merge cleanly)") {
    val df = (1 to 3000).map(i => ("a", s"v${i % 997}")).toDF("g", "v")
    val s1 = Kmv.sketch(df.repartition(1), Seq("g"), col("v"), k = 64)
      .head().getSeq[Long](1)
    val s17 = Kmv.sketch(df.repartition(17), Seq("g"), col("v"), k = 64)
      .head().getSeq[Long](1)
    assert(s1 == s17)
    assert(s1.length == 64 && s1.distinct.length == 64)
  }
}
