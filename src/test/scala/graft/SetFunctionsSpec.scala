package graft

import org.apache.spark.sql.functions._

import graft.functions.SetFunctions

class SetFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def prep(c: String) = sort_array(array_distinct(col(c)))

  test("jaccard_sorted matches the array_intersect formula on random sets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200) { i =>
      (Array.fill(rnd.nextInt(30) + 1)(rnd.nextInt(40).toLong),
        Array.fill(rnd.nextInt(30) + 1)(rnd.nextInt(40).toLong))
    }
    val df = rows.toDF("a", "b")
      .select(prep("a").as("a"), prep("b").as("b"))
    val inter = size(array_intersect(col("a"), col("b")))
    val union = size(col("a")) + size(col("b")) - inter
    val got = df.select(
      SetFunctions.jaccardSorted(col("a"), col("b")).as("fused"),
      (inter.cast("double") / union.cast("double")).as("composed")).collect()
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"fused=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  test("known values, null propagation, empty-set NaN parity") {
    val df = Seq(
      (Some(Array(1L, 2L, 3L)), Some(Array(2L, 3L, 4L))), // 2/4
      (Some(Array(1L, 2L)), Some(Array(1L, 2L))),         // 1.0
      (Some(Array(1L)), Some(Array(2L))),                 // 0.0
      (Some(Array.empty[Long]), Some(Array.empty[Long])), // 0/0 => NaN
      (None: Option[Array[Long]], Some(Array(1L)))        // null
    ).toDF("a", "b")
    val r = df.select(SetFunctions.jaccardSorted(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 0.5)
    assert(r(1).getDouble(0) == 1.0)
    assert(r(2).getDouble(0) == 0.0)
    assert(r(3).getDouble(0).isNaN)
    assert(r(4).isNullAt(0))
  }

  test("stays inside whole-stage codegen and is SQL-callable") {
    // non-foldable input (literals would collapse to a LocalTableScan);
    // sequence() arrays are sorted+distinct AND codegen-friendly, unlike
    // transform() whose lambda is CodegenFallback and would break the span
    val df = spark.range(100).select(
        sequence(lit(1L), col("id") % 5 + 2).as("a"),
        sequence(col("id") % 3 + 1, col("id") % 3 + 5).as("b"))
      .select(SetFunctions.jaccardSorted(col("a"), col("b")).as("j"))
    val codegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.exists(_.toString.contains("jaccard_sorted")),
      s"expression not in a codegen span:\n${df.queryExecution.executedPlan}")
    val s2 = spark.newSession()
    SetFunctions.registerAll(s2)
    import s2.implicits._
    Seq((Array(1L, 2L), Array(2L, 3L))).toDF("a", "b").createOrReplaceTempView("t_js")
    assert(s2.sql("SELECT jaccard_sorted(a, b) FROM t_js").head().getDouble(0)
      == 1.0 / 3.0)
  }
}
