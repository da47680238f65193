package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Ann

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),   // identical -> 1
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),   // orthogonal -> 0
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),  // opposite -> -1
      (Array(1f, 2f, 3f), Array(2f, 4f, 6f))    // parallel -> 1
    ).toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(math.abs(got(3) - 1.0) < 1e-12)
  }

  test("codegen result equals interpreted eval and driver-side cosine") {
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j).toFloat)))
    val df = vecs.toDF("id", "v")
    val q = vecs.head._2.toSeq
    val viaExpr = df.select(col("id"), cosineSim(col("v"), typedlit(q)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(viaExpr(id) == Ann.cosine(v.toSeq, q),
        s"codegen vs driver fold mismatch for id=$id")
    }
  }

  test("code_dot: int codes x double query, codegen == driver fold") {
    val rows = Seq.tabulate(30)(i =>
      (i.toLong, Seq.tabulate(16)(j => (i * 7 + j * 3) % 256)))
    val df = rows.toDF("id", "codes")
    val q = Seq.tabulate(16)(j => math.sin(j * 1.3))
    val got = df.select(col("id"), codeDot(col("codes"), typedlit(q)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, cs) =>
      var want = 0.0
      var i = 0
      while (i < cs.length) { want += q(i) * cs(i).toDouble; i += 1 }
      assert(got(id) == want, s"code_dot mismatch for id=$id")
    }
    // null in => null out
    val n = Seq((Option.empty[Seq[Int]], Option(q))).toDF("c", "q")
      .select(codeDot(col("c"), col("q"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("null input yields null; dim mismatch throws") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception](bad.select(cosineSim(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("dimension mismatch")
      || e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("l2Normalize produces unit vectors; dot == cosine afterwards") {
    val df = Seq((Array(3f, 4f), Array(1f, 7f))).toDF("a", "b")
    val n = df.select(
      l2Norm(l2Normalize(col("a"))).as("na"),
      dotProduct(l2Normalize(col("a")), l2Normalize(col("b"))).as("dp"),
      cosineSim(col("a"), col("b")).as("cs")).head()
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(n.getDouble(1) - n.getDouble(2)) < 1e-6)
  }

  test("SQL registration works") {
    registerAll(spark)
    Seq((Array(1f, 2f), Array(2f, 1f))).toDF("a", "b").createOrReplaceTempView("vv")
    val r = spark.sql("SELECT cosine_similarity(a, b) c, dot_product(a, b) d FROM vv").head()
    assert(math.abs(r.getDouble(0) - 0.8) < 1e-12)
    assert(r.getDouble(1) == 4.0)
  }

  test("property: cosine symmetric, self-similarity 1, bounded (100 random pairs)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val a = Seq.fill(8)(rnd.nextFloat() * 10 - 5).map(x => if (x == 0f) 1f else x)
      val b = Seq.fill(8)(rnd.nextFloat() * 10 - 5).map(x => if (x == 0f) 1f else x)
      val ab = Ann.cosine(a, b)
      assert(math.abs(ab - Ann.cosine(b, a)) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(Ann.cosine(a, a) - 1.0) < 1e-9)
    }
  }
}
