package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder

/** Batch index build — the Spark re-expression of the reference's
  * `CREATE CORTEX SEARCH SERVICE ... ON EMBED_STR ATTRIBUTES ... AS (SELECT
  * ...)` (`/root/reference/01_method1_cortex_search.sql:168-186`) and the
  * manual `UPDATE ... SET EMBEDDING = EMBED_TEXT_768(...) WHERE EMBED_STR IS
  * NOT NULL` batch path (`02:170-172`):
  *
  *   source df -> embed text column (only where non-null) -> persist Parquet
  *   partitioned by a low-cardinality attribute (`02:407` prescribes
  *   clustering by SPORT_TYPE; partitionBy gives the same pruning in Spark).
  *
  * The embedding column is also L2-normalized at build time so the scan-side
  * scorer can use the cheaper dot product when it wants (norm preserved by
  * construction = 1).
  */
object IndexBuilder {

  def withEmbeddings(df: DataFrame, embedder: Embedder,
                     textCol: String = "EMBED_STR",
                     embCol: String = "EMBEDDING"): DataFrame =
    df.withColumn(embCol,
      when(col(textCol).isNotNull, embedder.embedCol(col(textCol))))

  /** Build and persist the index; returns the reloaded (pruned-scan-capable)
    * DataFrame.
    *
    * Point lookups by `idCol` (the reference's Search Optimization Service
    * analog, `02:423`; SURVEY §4) are served by parquet bloom filters
    * written on that column: a row-group whose filter rejects the key is
    * skipped without decoding — the columnar stand-in for a point index.
    *
    * 100 TB write-path knobs:
    *  - `maxRecordsPerFile` (0 = unlimited) bounds output file size so a
    *    hot partition directory never degenerates into one giant
    *    unsplittable file — scan parallelism is decided at WRITE time.
    *  - `clusterBy` sorts within Spark partitions before writing, so each
    *    file/row-group covers a narrow range of the clustered columns and
    *    min/max statistics prune range predicates the way the reference's
    *    `CLUSTER BY` does (`02:407`).
    */
  def buildAndPersist(df: DataFrame, embedder: Embedder, path: String,
                      partitionCols: Seq[String] = Seq("SPORT_TYPE"),
                      textCol: String = "EMBED_STR",
                      idCol: String = "ID",
                      maxRecordsPerFile: Long = 0L,
                      clusterBy: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val withEmb = withEmbeddings(df, embedder, textCol)
    // prefix the cluster sort with the partition columns: the file writer
    // requires task rows ordered by partition cols and would otherwise
    // insert its own (unstable) sort, destroying the clustering
    val clustered =
      if (clusterBy.nonEmpty)
        withEmb.sortWithinPartitions((partitionCols ++ clusterBy).map(col): _*)
      else withEmb
    val writer = clustered.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$idCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$idCol", "1000000")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
    spark.read.parquet(path)
  }
}
