package graft

import org.apache.spark.sql.functions._

import graft.operators.Binning

/** Equi-depth binning: exact cut placement, tie atomicity, depth
  * balance without ties, null handling, bin range contract.
  */
class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("distinct values split into exactly equal quarters") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val got = Binning.withEquiDepthBin(df, "v", 4)
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min("v").as("lo"), max("v").as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, 25L, 1L, 25L), (1L, 25L, 26L, 50L),
      (2L, 25L, 51L, 75L), (3L, 25L, 76L, 100L)))
  }

  test("a tied value never splits across bins; depths go honest-unequal") {
    // 10x value 1, 1x values 2..6: B=3 over n=15 -> cuts at c_before*3 div 15
    val df = (Seq.fill(10)(1L) ++ (2L to 6L)).toDF("v")
    val got = Binning.withEquiDepthBin(df, "v", 3)
      .groupBy("v").agg(countDistinct("bin").as("nb"), min("bin").as("b"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.values.forall(_._1 === 1L), "one bin per value")
    assert(got(1L)._2 === 0L) // c_before=0
    assert(got(2L)._2 === 2L, "the tie mass fills bins 0-1; 2..6 land in bin 2")
    assert(got(6L)._2 === 2L)
  }

  test("bins stay in [0, B-1]; nulls get a null bin; rows preserved") {
    val df = (Seq[Option[Long]](None, None) ++ (1L to 13L).map(Some(_)))
      .toDF("v")
    val out = Binning.withEquiDepthBin(df, "v", 5)
    assert(out.count() === 15L)
    val bins = out.where(col("v").isNotNull).select("bin")
      .as[Long].collect()
    assert(bins.min === 0L && bins.max === 4L)
    assert(out.where(col("v").isNull && col("bin").isNull).count() === 2L)
  }

  test("binning is a monotone function of the value") {
    val df = Seq(5L, 3L, 9L, 1L, 7L, 3L, 5L, 11L, 2L, 8L).toDF("v")
    val pairs = Binning.equiDepthDict(df, "v", 4)
      .orderBy("v").select("v", "bin").as[(Long, Long)].collect().toSeq
    assert(pairs.map(_._2) === pairs.map(_._2).sorted, "v up => bin up")
  }
}
