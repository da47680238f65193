package graft

import graft.operators.TargetEncode

/** LOO target encoding: hand-computed means, self-exclusion (the
  * leakage property), singleton/null contracts.
  */
class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("LOO mean excludes the row's own target") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L), (5L, "b", 200L),
      (6L, "c", 7L) // singleton
    ).toDF("id", "cat", "t")
    val got = TargetEncode.looMean(df, "cat", "t", "enc")
      .select("id", "enc").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some((20.0 + 30.0) / 2))
    assert(got(2L) === Some((10.0 + 30.0) / 2))
    assert(got(3L) === Some((10.0 + 20.0) / 2))
    assert(got(4L) === Some(200.0))
    assert(got(5L) === Some(100.0))
    assert(got(6L) === None, "singleton category has no other row — null, not 0")
    // leakage check: no row's encoding equals the plain category mean
    assert(got(1L) !== Some(20.0))
  }

  test("null category / null target pass through with null encoding") {
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), Some(20L)),
      (3L, None, Some(99L)), (4L, Some("a"), None)
    ).toDF("id", "cat", "t")
    val got = TargetEncode.looMean(df, "cat", "t", "enc")
      .select("id", "enc").as[(Long, Option[Double])].collect().toMap
    assert(got(3L) === None && got(4L) === None)
    assert(got(1L) === Some(20.0), "null-target row contributes nothing to the stats")
    assert(got.size === 4, "rows are passed through, never dropped")
  }
}
