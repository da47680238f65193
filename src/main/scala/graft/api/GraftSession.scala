package graft.api

import org.apache.spark.sql.SparkSession

/** Blessed SparkSession factory for the engine: UTC semantics, right-sized
  * shuffle partitions, AQE with skew handling on, and the engine's SQL
  * functions registered — one call instead of a config checklist.
  *
  * `shufflePartitions` should track total executor cores (the builder
  * default suits local runs; on a cluster pass cores×executors or rely on
  * AQE coalescing from a higher initial number).
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.parquet.filterPushdown", "true")

  /** Build (or reuse) the session and ensure every graft SQL function is
    * registered even when attaching to a pre-existing session (where the
    * extensions config of this builder would be ignored).
    */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.VectorFunctions.registerAll(spark)
    graft.functions.TextHashFunctions.registerAll(spark)
    graft.functions.SetFunctions.registerAll(spark)
    spark
  }
}
