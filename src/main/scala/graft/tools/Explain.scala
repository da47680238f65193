package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain <sfDir> <query> [<query>...]`
  * prints the formatted physical plan and timed noop execution per query —
  * the iterate-on-plan-shape loop the build prompt prescribes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // time construction separately: queries with driver-side steps
      // (stored-vector fetch, k-means, the components loop) do real work
      // before a plan exists, and Bench measures both
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      println(s"\n========== $name ==========")
      df.explain("formatted")
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[timing] $name: build ${(t1 - t0) / 1e9}%.2f s + exec ${(t3 - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
