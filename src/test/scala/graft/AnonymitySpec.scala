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

  test("recode keeps every row exactly once and never drops columns") {
    val out = Anonymity.withRecodeLevel(rows, Seq(Seq("city")), k = 100)
    assert(out.count() === 7L)
    assert(out.columns.toSet === Set("city", "band", "dx", "anon_level"))
    assert(out.where(col("anon_level") === 1).count() === 7L,
      "k above every group size suppresses everything")
  }
}
