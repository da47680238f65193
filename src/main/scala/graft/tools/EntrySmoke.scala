package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke check: SparkEntry.entry rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry-smoke] rows=${rows.length} cols=${df.columns.mkString(",")}")
    assert(rows.nonEmpty, "entry() must return rows")
    spark.stop()
  }
}
