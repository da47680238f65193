package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * min/max file pruning: sorting by an interleaved-bit key keeps files'
  * bounding boxes small in EVERY participating dimension, so a predicate on
  * ANY of them prunes files from the scan. A single-column sort clusters
  * only its own column; at 100 TB the difference is whether the second
  * dimension's filter reads the whole table or a sliver. (The technique
  * behind ZORDER BY in lakehouse table formats; Morton 1966.)
  *
  * [[zValue]] is pure integer bit arithmetic over Catalyst built-ins
  * (shift/and/sum — codegen'd, no UDF); [[clusterByZ]] is
  * `repartitionByRange` + in-partition sort on that key, i.e. ONE range
  * shuffle whose sampling pass Catalyst already runs for any range
  * partitioning. Dimensions must be bucketized to non-negative ints by the
  * caller (rank, hash-mod, or width bucket — whatever matches the query
  * predicates' granularity).
  */
object Layout {

  /** Interleave the low `bitsPerDim` bits of each column (dimension j's
    * bit i lands at position `i * d + j`). Columns must be non-negative
    * integers below 2^bitsPerDim; nulls propagate to a null key (sorted
    * together, like any null sort key). d * bitsPerDim must fit a long.
    */
  def zValue(cols: Seq[Column], bitsPerDim: Int): Column = {
    val d = cols.size
    require(d >= 2, "z-ordering needs at least 2 dimensions")
    require(d * bitsPerDim <= 62, s"$d dims x $bitsPerDim bits overflow a long")
    val terms = for {
      j <- 0 until d
      i <- 0 until bitsPerDim
    } yield shiftleft(
      shiftright(cols(j).cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ + _)
  }

  /** Cluster `df` on the Morton key of `dims` (pre-bucketized columns):
    * range-repartition + in-partition sort, so each output file's min/max
    * stats are tight in every dimension. The key column (`zCol`) is kept —
    * it doubles as a coarse spatial index downstream.
    */
  def clusterByZ(df: DataFrame, dims: Seq[Column], bitsPerDim: Int,
                 zCol: String = "zval", numFiles: Option[Int] = None): DataFrame = {
    val keyed = df.withColumn(zCol, zValue(dims, bitsPerDim))
    // default: let AQE size the range partitions to the advisory target
    // (file size ≈ advisory bytes); explicit numFiles pins the file count
    // (tests, or a caller matching a downstream reader's parallelism)
    numFiles.fold(keyed.repartitionByRange(col(zCol)))(
        n => keyed.repartitionByRange(n, col(zCol)))
      .sortWithinPartitions(col(zCol))
  }
}
