package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit, greatest, least, explode, sequence, slice, array_join, split}

/** Overlapping token-window chunking — the document→passage splitter that
  * feeds every embedding/RAG indexing pipeline (and the reference's own
  * ingest embeds bounded text units before indexing them,
  * `/root/reference/02_method2_manual_vector_embedding.sql:55-76`; this is
  * the step that produces those units from long documents). Fixed-size
  * windows with a fixed stride so consecutive chunks overlap by
  * `size - stride` tokens and no sentence straddling a boundary is lost.
  *
  * Chunk layout: starts at token offsets 0, stride, 2·stride, …; the number
  * of chunks is `1 + max(0, ceil((n - size) / stride))`, so every token is
  * covered, the final chunk may be short, and a doc shorter than one window
  * yields exactly one chunk. All of it is integer arithmetic on both
  * engines (the oracle replicates the formula verbatim; the one division
  * happens in doubles but on token-count-sized integers, where IEEE doubles
  * are exact).
  *
  * Scale shape: pure per-row projection + explode of a generated offset
  * sequence — NO shuffle, no window function, no join. Output volume is
  * input tokens × (1 + overlap/stride), decided by two literals; the
  * explode runs inside the scan stage, so at 100 TB the pass stays
  * scan-bound exactly like [[Pii]]. Null-text docs have no token stream and
  * produce no chunks (documented; count them upstream via [[Profile]]).
  */
object Chunk {

  /** Split `textCol` into overlapping `size`-token windows every `stride`
    * tokens. Output: `idCol`, `chunk_idx` (0-based), `chunk_text`,
    * `n_tokens` (≤ size; the final chunk carries the remainder).
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = split(col(textCol), " ")
    val n = F.size(toks).cast("long")
    // ceil((n - size)/stride) via the +stride-1 trick; short docs go
    // negative, truncate toward zero, and clamp to 0 → exactly one chunk.
    val extra = greatest(lit(0L),
      ((n - lit(size.toLong) + lit(stride.toLong - 1L)) / lit(stride.toLong))
        .cast("long"))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("_t"), n.as("_n"), extra.as("_extra"))
      .select(col(idCol), col("_t"), col("_n"),
        explode(sequence(lit(0L), col("_extra"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_t"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(size)), " ")
          .as("chunk_text"),
        least(lit(size.toLong), col("_n") - col("chunk_idx") * stride)
          .as("n_tokens"))
  }
}
