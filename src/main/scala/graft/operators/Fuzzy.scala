package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy vocabulary matching — the "did you mean" front end of lexical
  * search (a typo'd query term matches nothing in BM25/sparse retrieval;
  * routing it through its edit-distance-1 vocabulary neighbors restores
  * the hit).
  *
  * The scale mechanism is the SymSpell deletion-neighborhood join (Garbe's
  * symmetric-delete algorithm): two strings within edit distance 1 share
  * at least one member of their delete-one neighborhoods ({s} ∪ {s minus
  * one char}) — a deletion of a IS that variant, an insertion into a makes
  * a itself the variant of b, and a substitution shares the
  * both-sides-deleted form. So candidates come from an EQUI-JOIN on
  * variant strings (vocab side exploded once at build time — index-able,
  * |term|+1 rows per term; query side a bounded broadcast), never an
  * all-pairs levenshtein over the vocabulary; the exact thresholded
  * levenshtein verifies only the join survivors.
  */
object Fuzzy {

  /** Delete-one neighborhood of a term column: the term itself plus every
    * single-character deletion, deduped. Pure per-row projection.
    */
  private def deleteVariants(termCol: String): Column =
    expr(s"""array_union(array($termCol),
            |  transform(sequence(1, length($termCol)),
            |    i -> concat(substr($termCol, 1, i - 1),
            |                substr($termCol, i + 1, length($termCol)))))"""
      .stripMargin)

  /** Match `queryTerms` against the vocabulary within edit distance 1.
    * `vocab` is a (termCol, ...) relation — extra columns (document
    * frequency, index stats) ride through to the output. Output: one row
    * per (query_term, matched vocab row).
    */
  def matchTerms(vocab: DataFrame, termCol: String,
                 queryTerms: Seq[String]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    if (queryTerms.isEmpty)
      return vocab.withColumn("query_term", lit("")).where(lit(false))
        .select(col("query_term") +: vocab.columns.map(col): _*)
    val qRows = queryTerms.distinct.flatMap { q =>
      (q.indices.map(i => q.take(i) + q.drop(i + 1)) :+ q)
        .distinct.map(v => (q, v))
    }
    val qDf = qRows.toDF("query_term", "__var")
    vocab.where(length(col(termCol)) >= 1)
      .select(col(termCol) +: vocab.columns.filterNot(_ == termCol).map(col) :+
        explode(deleteVariants(termCol)).as("__var"): _*)
      .join(broadcast(qDf), "__var")
      .drop("__var")
      .distinct()
      .where(levenshtein(col("query_term"), col(termCol)) <= 1)
      .select(col("query_term") +: vocab.columns.map(col): _*)
  }
}
