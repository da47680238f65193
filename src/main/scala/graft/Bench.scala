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

    // best-of-2 per query, with the two runs in SEPARATE full passes over
    // the query list: the shared host sees multi-minute external load
    // bursts, and consecutive same-query runs would both land inside one
    // burst — temporally-separated runs make the min a real
    // least-contended estimate (and pass 2 is also codegen/JIT-warm).
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def onePass(): Map[String, Double] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = onePass(); val p2 = onePass()
    val results = names.map { case (name, _) =>
      name -> math.min(p1(name), p2(name))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
