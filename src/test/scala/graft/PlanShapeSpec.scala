package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.IndexBuilder
import graft.embed.HashingTfEmbedder

/** Plan-shape assertions (SURVEY §5.2.6): the optimizations the engine
  * relies on at scale must be visible in the physical plan, not assumed.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexPath = {
    val dir = Files.createTempDirectory("graft-planshape").toString
    val corpus = Seq(
      ("A1", "run fast intervals", "run", 5000),
      ("A2", "slow long run", "run", 12000),
      ("B1", "lake swim", "swim", 1500),
      ("C1", "hill ride", "ride", 30000)
    ).toDF("ID", "EMBED_STR", "SPORT_TYPE", "DISTANCE_METERS")
    IndexBuilder.buildAndPersist(corpus, HashingTfEmbedder(64), dir)
    dir
  }

  test("partitionBy(SPORT_TYPE) index gives partition pruning on sport filters") {
    val df = spark.read.parquet(indexPath).where(col("SPORT_TYPE") === "run")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("SPORT_TYPE"),
      s"expected partition pruning in scan:\n$scan")
    assert(df.count() == 2)
  }

  test("metadata predicates push down to the parquet scan") {
    val df = spark.read.parquet(indexPath)
      .where(col("DISTANCE_METERS") >= 4500 && col("DISTANCE_METERS") <= 6000)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual"),
      s"expected pushed filters in scan:\n$scan")
  }

  test("projection prunes columns at the scan (ReadSchema)") {
    val df = spark.read.parquet(indexPath).select("ID", "SPORT_TYPE")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("EMBEDDING"),
      s"embedding column must not be read for a metadata-only projection:\n$scan")
  }

  test("cosine scoring stays inside whole-stage codegen") {
    val df = spark.read.parquet(indexPath)
      .withColumn("score",
        graft.functions.VectorFunctions.cosineSim(col("EMBEDDING"),
          typedlit(Seq.fill(64)(0.1f))))
      .where(col("score") > 0.0)
    val codegenNodes = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty,
      s"no codegen span:\n${df.queryExecution.executedPlan}")
    // the scoring projection itself must be inside the codegen stage
    assert(codegenNodes.exists(_.toString.contains("cosine_similarity")))
  }

  test("function registration: extension hook applies; SQL path works per-session") {
    // injection hook is exercised against a raw SparkSessionExtensions (a
    // fully fresh session would need its own JVM); the SQL surface is then
    // verified through the imperative per-session registration
    new graft.api.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    val s2 = spark.newSession()
    graft.functions.VectorFunctions.registerAll(s2)
    graft.functions.TextHashFunctions.registerAll(s2)
    import s2.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b").createOrReplaceTempView("t_ext")
    assert(s2.sql("SELECT cosine_similarity(a, b) FROM t_ext").head().getDouble(0) == 1.0)
    assert(s2.sql("SELECT simhash60(array('x','y')) s").head().getLong(0) > 0L)
  }
}
