package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._

import graft.api.GraftExtensions
import graft.operators.Ann
import graft.plans.{AnnIndexMeta, IvfProbeRule}

/** The auto-probe optimizer rule: a pure-SQL cosine top-k over an
  * [[AnnIndexMeta]]-carrying parquet layout must become a partition-pruned
  * IVF probe — and must NOT fire anywhere else.
  */
class IvfProbeRuleSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated direction clusters in dim 4, 10 vectors each, ids
  // 1..40; the query leans toward cluster 0 with cluster 1 second-nearest.
  private val dim = 4
  private val cents: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
  private val qvec: Seq[Float] = Seq(0.9f, 0.4f, 0.1f, 0.05f)

  private lazy val corpus: DataFrame = {
    val rows = for {
      c <- 0 until 4
      j <- 0 until 10
    } yield {
      val base = cents(c)
      val noise = (0 until dim).map(d => ((c * 10 + j + d) % 7) * 0.02f)
      (c * 10 + j + 1L, base.zip(noise).map { case (b, n) => b + n })
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private lazy val indexPath: String = {
    val dir = Files.createTempDirectory("graft-ivfprobe").toString
    AnnIndexMeta.buildIvfIndex(corpus, "embedding", cents, dir, nProbe = 2)
    dir
  }

  private def qLit: String =
    qvec.map(f => f.toDouble.toString + "D").mkString("array(", ",", ")")

  private def topkSql(view: String): String =
    s"""SELECT vec_id,
       |  cosine_similarity(CAST(embedding AS ARRAY<DOUBLE>), $qLit) AS score
       |FROM $view ORDER BY score DESC, vec_id LIMIT 5""".stripMargin

  /** Run `body` with the rule attached and auto-probe enabled. */
  private def withProbe[T](s: SparkSession, confs: (String, String)*)(body: => T): T = {
    val prev = s.experimental.extraOptimizations
    if (!prev.exists(_.isInstanceOf[IvfProbeRule]))
      s.experimental.extraOptimizations = prev :+ IvfProbeRule(s)
    val keys = (IvfProbeRule.AutoProbeKey -> "true") +: confs
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      s.experimental.extraOptimizations = prev
    }
  }

  private def ivfCellFilters(df: DataFrame): Seq[LFilter] =
    df.queryExecution.optimizedPlan.collect {
      case f: LFilter if f.condition.references.exists(_.name == "ivf_cell") => f
    }

  private def partitionPruned(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectLeaves()
      .exists(l => l.toString.contains("PartitionFilters") &&
        "ivf_cell#\\d+ IN ".r.findFirstIn(l.toString).isDefined)

  graft.functions.VectorFunctions.registerAll(spark)

  test("sidecar round-trips exactly (floats, names, nProbe)") {
    val dir = Files.createTempDirectory("graft-sidecar").toString
    val meta = AnnIndexMeta.Meta("emb", "cell", 3,
      Seq(Seq(0.1f, -2.5e-8f, Float.MinPositiveValue), Seq(1f, 2f, 3f)))
    AnnIndexMeta.write(spark, dir, meta)
    val back = AnnIndexMeta.read(spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(dir))
    assert(back.contains(meta))
  }

  test("unreadable or absent sidecar reads as None, never throws") {
    val dir = Files.createTempDirectory("graft-nosidecar").toString
    val hc = spark.sessionState.newHadoopConf()
    assert(AnnIndexMeta.read(hc, new org.apache.hadoop.fs.Path(dir)).isEmpty)
    Files.writeString(java.nio.file.Paths.get(dir, AnnIndexMeta.FileName),
      "not an index\ngarbage")
    assert(AnnIndexMeta.read(hc, new org.apache.hadoop.fs.Path(dir)).isEmpty)
  }

  test("auto-probe rewrites SQL top-k into a partition-pruned probe") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_auto")
    withProbe(spark) {
      val out = spark.sql(topkSql("ivf_auto"))
      assert(ivfCellFilters(out).size == 1, "exactly one injected probe filter")
      assert(partitionPruned(out),
        s"probe must prune partitions:\n${out.queryExecution.executedPlan}")
      val expected = Ann.topKIvf(
        spark.read.parquet(indexPath)
          .withColumn("ivf_cell", col("ivf_cell").cast("int")),
        "vec_id", "embedding", "ivf_cell", cents, qvec, k = 5, nProbe = 2)
        .select("vec_id", "score").collect().toSeq
      assert(out.collect().toSeq == expected)
    }
  }

  test("probed result differs from exact here, and probe picks the 2 nearest cells") {
    // cluster 2/3 rows score low but ARE excluded from the scan: prove the
    // probe actually restricted the candidate set by widening k to 40
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_auto_all")
    val wide = topkSql("ivf_auto_all").replace("LIMIT 5", "LIMIT 40")
    withProbe(spark) {
      val ids = spark.sql(wide).collect().map(_.getLong(0)).toSet
      assert(ids.nonEmpty && ids.forall(_ <= 20L),
        s"only cells 0/1 (ids 1..20) may be scanned, got $ids")
    }
  }

  test("disabled conf: no rewrite, exact brute-force answer") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_off")
    val out = spark.sql(topkSql("ivf_off"))
    assert(ivfCellFilters(out).isEmpty)
    val exact = Ann.topK(corpus, "vec_id", "embedding", qvec, 5)
      .select("vec_id", "score").collect().toSeq
    assert(out.collect().toSeq == exact)
  }

  test("no sidecar: same layout, no rewrite") {
    val dir = Files.createTempDirectory("graft-plainivf").toString
    Ann.withIvfAssignment(corpus, "embedding", cents)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ivf_plain")
    withProbe(spark) {
      val out = spark.sql(topkSql("ivf_plain"))
      assert(ivfCellFilters(out).isEmpty)
    }
  }

  test("existing predicate on the assign column suppresses the rewrite") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_manual")
    withProbe(spark) {
      val out = spark.sql(
        topkSql("ivf_manual").replace("ORDER BY",
          "WHERE ivf_cell = 3 ORDER BY"))
      assert(ivfCellFilters(out).size == 1, "only the user's own filter")
      val ids = out.collect().map(_.getLong(0)).toSet
      assert(ids.forall(id => id >= 31L && id <= 40L),
        s"manual cell 3 probe must scan only ids 31..40, got $ids")
    }
  }

  test("nProbe conf overrides the sidecar default") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_np1")
    withProbe(spark, IvfProbeRule.NProbeKey -> "1") {
      val wide = topkSql("ivf_np1").replace("LIMIT 5", "LIMIT 40")
      val ids = spark.sql(wide).collect().map(_.getLong(0)).toSet
      assert(ids.nonEmpty && ids.forall(_ <= 10L),
        s"nProbe=1 must scan only cell 0 (ids 1..10), got $ids")
    }
  }

  test("nProbe >= nCells keeps the exact (unpruned) plan") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_full")
    withProbe(spark, IvfProbeRule.NProbeKey -> "4") {
      val out = spark.sql(topkSql("ivf_full"))
      assert(ivfCellFilters(out).isEmpty, "full probe prunes nothing — no rewrite")
      val exact = Ann.topK(corpus, "vec_id", "embedding", qvec, 5)
        .select("vec_id", "score").collect().toSeq
      assert(out.collect().toSeq == exact)
    }
  }

  test("dimension mismatch between query literal and centroids: no rewrite") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_dim")
    withProbe(spark) {
      val bad = qvec.take(3).map(f => f.toDouble.toString + "D")
        .mkString("array(", ",", ")")
      val out = spark.sql(
        s"""SELECT vec_id, cosine_similarity(
           |  CAST(slice(embedding, 1, 3) AS ARRAY<DOUBLE>), $bad) AS score
           |FROM ivf_dim ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)
      assert(ivfCellFilters(out).isEmpty)
    }
  }

  test("ascending sort (bottom-k) is not a search: no rewrite") {
    spark.read.parquet(indexPath).createOrReplaceTempView("ivf_asc")
    withProbe(spark) {
      val out = spark.sql(topkSql("ivf_asc").replace("score DESC", "score ASC"))
      assert(ivfCellFilters(out).isEmpty)
    }
  }

  test("a session built with GraftExtensions carries the rule end-to-end") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 =
      try SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(s2 ne base, "builder must have created a fresh session")
    try {
      SparkSession.setActiveSession(s2)
      s2.conf.set(IvfProbeRule.AutoProbeKey, "true")
      s2.read.parquet(indexPath).createOrReplaceTempView("ivf_ext")
      val out = s2.sql(topkSql("ivf_ext"))
      assert(partitionPruned(out),
        s"extension-injected rule must prune:\n${out.queryExecution.executedPlan}")
      val expected = Ann.topKIvf(
        s2.read.parquet(indexPath)
          .withColumn("ivf_cell", col("ivf_cell").cast("int")),
        "vec_id", "embedding", "ivf_cell", cents, qvec, k = 5, nProbe = 2)
        .select("vec_id", "score").collect().toSeq
      assert(out.collect().toSeq == expected)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
