package graft

import org.apache.spark.sql.functions._

import graft.operators.Anonymity

/** k-anonymity / l-diversity audit and ladder recoding: hand-computed
  * cell verdicts, finest-passing-level assignment, suppression bucket.
  */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  // (city, age_band) quasi-identifiers, diagnosis sensitive
  private def rows = Seq(
    ("paris", "20s", "flu"), ("paris", "20s", "cold"),
    ("paris", "20s", "flu"), ("paris", "20s", "hay"),
    ("paris", "30s", "flu"), ("paris", "30s", "flu"),
    ("lyon", "20s", "flu")
  ).toDF("city", "band", "dx")

  test("audit: group sizes, sensitive diversity, k/l verdicts per cell") {
    val got = Anonymity.audit(rows, Seq("city", "band"), col("dx"), k = 3, l = 3)
      .select("city", "band", "n", "ndv", "k_ok", "l_ok")
      .as[(String, String, Long, Long, Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("paris", "20s")) === (("paris", "20s", 4L, 3L, true, true)))
    assert(got(("paris", "30s")) === (("paris", "30s", 2L, 1L, false, false)),
      "big enough for nothing: 2 rows, 1 diagnosis")
    assert(got(("lyon", "20s")) === (("lyon", "20s", 1L, 1L, false, false)))
  }

  test("recode: each row lands on its finest passing level; suppression last") {
    val ladder = Seq(Seq("city", "band"), Seq("city"))
    val got = Anonymity.withRecodeLevel(rows, ladder, k = 3)
      .groupBy("city", "band").agg(min("anon_level").as("lo"),
        max("anon_level").as("hi"))
      .as[(String, String, Int, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // paris/20s passes at the finest level; paris/30s only as all-paris (6 rows)
    assert(got(("paris", "20s")) === ((0, 0)))
    assert(got(("paris", "30s")) === ((1, 1)))
    // lyon never reaches k=3 at any level -> suppression bucket (= ladder size)
    assert(got(("lyon", "20s")) === ((2, 2)))
  }

  test("streaming audit ≡ batch sketch under arbitrary slicing") {
    import graft.streaming.AnonymityStream
    import graft.operators.Hll
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_anon_stream").toString
    val data = (1 to 90).map(i =>
      (s"city${i % 3}", s"dx${i % (5 + i % 2)}_$i"))
    val df = data.toDF("city", "dx")
    // three uneven arbitrary slices — sums and maxes don't care
    Seq(data.take(11), data.slice(11, 60), data.drop(60)).foreach { sl =>
      AnonymityStream.accumulateBatch(tmp, sl.toDF("city", "dx"),
        Seq("city"), col("dx"))
    }
    val got = AnonymityStream.audit(spark, tmp, Seq("city"), k = 30L, 20.0)
      .select("city", "n", "hll_est", "k_ok", "l_ok_est")
      .as[(String, Long, Double, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // batch twin: exact counts + the same sketch over the whole data
    val wantEst = Hll.estimateFromRegisters(
      Hll.registers(df, Seq("city"), col("dx")), Seq("city"))
      .as[(String, Double)].collect().toMap
    data.groupBy(_._1).foreach { case (city, rows) =>
      val g = got(city)
      assert(g._2 === rows.size.toLong, s"$city exact count")
      assert(g._3 === wantEst(city), s"$city sketch must merge exactly")
      assert(g._4 === (rows.size >= 30))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("recode keeps every row exactly once and never drops columns") {
    val out = Anonymity.withRecodeLevel(rows, Seq(Seq("city")), k = 100)
    assert(out.count() === 7L)
    assert(out.columns.toSet === Set("city", "band", "dx", "anon_level"))
    assert(out.where(col("anon_level") === 1).count() === 7L,
      "k above every group size suppresses everything")
  }
}
