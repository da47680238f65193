package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall seconds.
  *
  * Results are forced with the `noop` sink (not `count()`) so projections,
  * scoring expressions, and joins are fully executed instead of being pruned
  * away under a count-only plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the smallest SF so per-query numbers
    // measure the engine, not first-call JIT + classload.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // best-of-N per query (default 3), with the runs in SEPARATE full
    // passes over the query list: the shared host sees multi-minute
    // external load bursts, and consecutive same-query runs would both
    // land inside one burst — temporally-separated runs make the min a
    // real least-contended estimate (and later passes are codegen/JIT-
    // warm). Two rounds of verdicts spent their perf sections proving
    // 2-3x "regressions" were host noise; three separated passes close
    // that forensic loop, and the JSON records the pass count.
    // NUMERIC id order (q9 before q100), so a consumer that truncates the
    // tail drops the highest-numbered — newest — queries last, not the
    // lexicographically unlucky ones.
    val names = SparkEntry.queries.toSeq
      .sortBy { case (name, _) =>
        // non-q<digits> names sort last instead of aborting the whole bench
        val ds = name.drop(1).takeWhile(_.isDigit)
        (if (ds.isEmpty) Int.MaxValue else ds.toInt, name)
      }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def onePass(): Map[String, Double] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a crashed query must NOT masquerade as a fast timing (round 6:
        // 28 instant analysis failures read as 0.05 s "speedups")
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    require(passes >= 1,
      s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    val allPasses = (1 to passes).map(_ => onePass())
    val results = names.collect { case (name, _) if !failed(name) =>
      name -> allPasses.map(_(name)).min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","passes":$passes,"queries":$qs,"failed":$fj,"sf":"$sfDir"}"""
    println(line)
    // stdout capture can truncate; keep the whole line on disk too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
