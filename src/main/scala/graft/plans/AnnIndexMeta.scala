package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Sidecar metadata that turns a plain `partitionBy(ivf_cell)` parquet
  * directory into a *self-describing ANN index*: the coarse-quantizer
  * centroids, the column names, and a default probe width live next to the
  * data in a tiny `_graft_ann_ivf` file (same spirit as parquet's own
  * `_SUCCESS` / `_metadata` siblings). [[IvfProbeRule]] looks this file up
  * from the scan's root path, which is what lets a *pure SQL* top-k query
  * over the index be rewritten into a partition-pruned probe with no API
  * call and no session state — the Spark analog of the reference's "create
  * the search service once, then just query it"
  * (`/root/reference/01_method1_cortex_search.sql:168-186`).
  *
  * Format: a hand-rolled line-oriented text file (header, `k=v` pairs, one
  * `centroid=` line per cell with `Float.toString` components — which
  * round-trip exactly in Java). Deliberately not JSON: zero dependency on
  * any JSON library's version drift, trivially greppable, and append-safe
  * to inspect by hand. Size is nCells x dim floats — kilobytes, driver-side
  * by construction (the same centroids ship as plan literals anyway).
  */
object AnnIndexMeta {

  val FileName = "_graft_ann_ivf"
  private val Header = "graft-ann-ivf v1"

  case class Meta(embCol: String, assignCol: String, nProbe: Int,
                  centroids: Seq[Seq[Float]]) {
    require(centroids.nonEmpty, "ANN index needs at least one centroid")
    def dim: Int = centroids.head.length
  }

  def write(spark: SparkSession, root: String, meta: Meta): Unit = {
    val p = new Path(root, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder
      sb ++= Header += '\n'
      sb ++= s"embCol=${meta.embCol}\n"
      sb ++= s"assignCol=${meta.assignCol}\n"
      sb ++= s"nProbe=${meta.nProbe}\n"
      meta.centroids.foreach { c =>
        sb ++= "centroid="
        sb ++= c.map(_.toString).mkString(",")
        sb += '\n'
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Read the sidecar under `root`, or None when the directory is not an
    * ANN index. Cached by (path, mtime): the optimizer consults this on
    * every candidate query, and an index rebuild (new mtime) invalidates
    * naturally. Unreadable/corrupt sidecars read as None — the rule then
    * simply leaves the plan alone, never fails the query.
    */
  def read(hadoopConf: Configuration, root: Path): Option[Meta] = {
    try {
      val p = new Path(root, FileName)
      val fs = p.getFileSystem(hadoopConf)
      if (!fs.exists(p)) return None
      val mtime = fs.getFileStatus(p).getModificationTime
      val key = (p.toString, mtime)
      Option(cache.get(key)).orElse {
        val m = parse(readFully(fs, p))
        m.foreach(v => cache.put(key, v))
        m
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Meta]()

  private def readFully(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def parse(text: String): Option[Meta] = {
    val lines = text.linesIterator.toSeq
    if (lines.isEmpty || lines.head.trim != Header) return None
    val kv = lines.tail.flatMap { l =>
      l.indexOf('=') match {
        case i if i > 0 => Some(l.substring(0, i) -> l.substring(i + 1))
        case _ => None
      }
    }
    val pairs = kv.filterNot(_._1 == "centroid").toMap
    val cents = kv.collect { case ("centroid", v) =>
      v.split(',').toSeq.map(_.toFloat)
    }
    for {
      emb <- pairs.get("embCol")
      assign <- pairs.get("assignCol")
      nProbe <- pairs.get("nProbe").flatMap(_.toIntOption)
      if cents.nonEmpty && cents.forall(_.length == cents.head.length)
    } yield Meta(emb, assign, nProbe, cents)
  }

  /** Build + persist a self-describing IVF index in one call: assign every
    * row to its nearest centroid ([[Ann.withIvfAssignment]] — a no-shuffle
    * per-row argmax with the centroids broadcast as literals), write
    * `partitionBy(assignCol)` so a probe's cell filter is partition
    * pruning, and drop the sidecar so SQL queries auto-probe. Returns the
    * reloaded index with the partition column restored to int.
    */
  def buildIvfIndex(df: DataFrame, embCol: String,
                    centroids: Seq[Seq[Float]], path: String,
                    nProbe: Int = 2,
                    assignCol: String = "ivf_cell"): DataFrame = {
    val spark = df.sparkSession
    Ann.withIvfAssignment(df.where(col(embCol).isNotNull), embCol, centroids,
        assignCol)
      .write.mode("overwrite").partitionBy(assignCol).parquet(path)
    write(spark, path, Meta(embCol, assignCol, nProbe, centroids))
    spark.read.parquet(path)
      .withColumn(assignCol, col(assignCol).cast("int"))
  }
}
