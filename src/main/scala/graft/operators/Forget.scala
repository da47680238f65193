package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion propagation — the "right to be forgotten" sweep a
  * production training-data platform owes its sources: given a purge
  * set of doc ids, remove them from the corpus AND from every derived
  * artifact without rebuilding the world. The corpus side is a
  * broadcast anti-join (map-side at any scale: the purge set is
  * human-request-bounded). The lexical index side is INCREMENTAL: the
  * only postings rows that change are those OF the purged docs, and the
  * only corpus statistics BM25 needs (N, Σdl, per-term df) update by
  * exact integer SUBTRACTION of the purged docs' contributions — so
  * serving continues from the amended artifact with scores equal
  * BIT-FOR-BIT to a full rebuild over the remaining corpus (ForgetSpec
  * + the q202 oracle pin it). The dense/serving side is
  * [[graft.serve.DeltaAnnIndex.delete]]'s tombstones until the next
  * index publish.
  *
  * At 100 TB: `purgeCorpus` rewrites only the files containing purged
  * rows (with a partitioned layout, partition pruning bounds the
  * rewrite); `purgePostings` touches only the term partitions the
  * purged docs appear in ([[lexDeltas]] names those terms); nothing
  * re-reads the unaffected corpus.
  */
object Forget {

  /** Corpus purge, scale form: broadcast the (bounded) purge set and
    * anti-join — a map-side filter over the corpus scan.
    */
  def purgeCorpus(df: DataFrame, idCol: String, purged: DataFrame,
                  purgedIdCol: String): DataFrame =
    df.join(
      broadcast(purged.select(col(purgedIdCol).cast("long").as("__purge_id"))
        .distinct()),
      col(idCol) === col("__purge_id"), "left_anti")

  /** Bounded-list convenience form (an IN-list literal in the scan). */
  def purgeCorpusIds(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    df.where(!col(idCol).isin(ids: _*))

  /** The purged docs' exact contributions to the BM25 corpus stats:
    * doc count, Σ document length, and per-term df — everything needed
    * to amend (N, avgdl, idf) by subtraction. `affectedTerms` is also
    * the partition list an incremental artifact rewrite touches.
    * Collected driver-side: bounded by |purge set| × their vocabulary.
    */
  final case class LexDeltas(docsDropped: Long, dlDropped: Long,
                             dfDropped: Map[String, Long]) {
    def affectedTerms: Set[String] = dfDropped.keySet
  }

  def lexDeltas(postings: DataFrame, docs: DataFrame, idCol: String,
                textCol: String, purged: Seq[Long]): LexDeltas = {
    // doc-level facts (count, Σdl) come from the CORPUS, not the
    // postings: a purged doc with NULL/empty text has no postings rows
    // yet still counts in N — deriving the count from postings would
    // leave its contribution in the amended stats and break the
    // rebuild-parity contract. The dl expression mirrors the stats
    // computation exactly (null text → null dl → counts in N,
    // contributes 0 to Σdl, same as the rebuild's aggregate).
    val d = docs.where(col(idCol).isin(purged: _*))
      .select(size(split(col(textCol), " ")).cast("long").as("__dl"))
      .agg(count(lit(1)), sum("__dl")).head()
    val rows = postings.where(col(idCol).isin(purged: _*))
      .select(col("term"), col(idCol).cast("long"))
      .collect()
    LexDeltas(
      d.getLong(0),
      if (d.isNullAt(1)) 0L else d.getLong(1),
      rows.groupBy(_.getString(0)).map { case (t, rs) => t -> rs.length.toLong })
  }

  /** The amended postings: rows of purged docs drop; every other row is
    * byte-identical (tf and dl are per-doc facts). Only partitions of
    * [[LexDeltas.affectedTerms]] actually change.
    */
  def purgePostings(postings: DataFrame, idCol: String,
                    purged: Seq[Long]): DataFrame =
    postings.where(!col(idCol).isin(purged: _*))

  /** df map after the purge: exact subtraction; terms whose last doc
    * was purged vanish (no postings rows remain to score).
    */
  def updatedDf(df: Map[String, Long], deltas: LexDeltas): Map[String, Long] =
    df.flatMap { case (t, c) =>
      val c2 = c - deltas.dfDropped.getOrElse(t, 0L)
      if (c2 > 0) Some(t -> c2) else None
    }
}
