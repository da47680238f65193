import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q22_minhash_signatures", "q23_minhash_lsh_pairs",
      "q24_simhash", "q39_jaccard_prefix", "q40_jaccard_lsh")
    (1 to 2).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"MINI r$round $n ${(System.nanoTime()-t0)/1e9}%.2f s")
        Console.flush()
      }
    }
    spark.stop()
  }
}
