package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline, end to end in one call:
  * exact dedup -> near-dup pair graph -> component survivors -> benchmark
  * decontamination -> quality scoring -> per-source gate -> deterministic
  * split -> sharded sequence packing. Each stage is an individually-gated
  * operator (Dedup / Components / Decontaminate / Gate / Sampling / Pack);
  * composing them here is what surfaces stage-boundary bugs (column
  * collisions, exchange reuse across stages) that per-stage gates cannot.
  *
  * Two frames in the DAG have many consumers: the exact-dedup output feeds
  * near-dup pair generation (both self-join sides), the survivor join-back,
  * and the decontamination corpus; the scored frame feeds the gate's
  * threshold pass and its filter pass. Left unmaterialized, every consumer
  * re-expands the whole upstream subtree and the composed plan scans the
  * corpus 26 times; materializing exactly those two seams cuts it to the
  * stage count. HOW they materialize is the [[Seam]] parameter — the
  * reliability/cost trade belongs to the caller, not the operator.
  */
object Curation {

  /** Stage-seam materialization strategy. */
  sealed trait Seam {
    /** Materialize `df` as a stage boundary named `stage`, returning the
      * frame downstream stages should consume. */
    def materialize(df: DataFrame, stage: String): DataFrame
  }

  /** Eager in-memory/disk checkpoint on the executors — cheapest seam and
    * the right call for tests and single-host runs, but the blocks live
    * only in executor storage: one executor loss mid-DAG is unrecoverable
    * and the whole job restarts from the source.
    */
  case object LocalSeam extends Seam {
    def materialize(df: DataFrame, stage: String): DataFrame =
      df.localCheckpoint(eager = true)
  }

  /** Parquet write + read-back under `dir/<stage>` — the production form
    * for long multi-stage runs on real clusters: seams survive executor
    * loss AND driver restart, and each stage output is independently
    * inspectable / resumable / re-consumable. The caller owns `dir`
    * lifecycle — stage outputs are the restart artifact, so nothing here
    * deletes them; point successive runs at distinct dirs (writes use
    * overwrite mode, so a re-run with the same dir is safe but destroys
    * the previous run's seams).
    */
  final case class StageDir(dir: String) extends Seam {
    def materialize(df: DataFrame, stage: String): DataFrame = {
      val path = s"$dir/$stage"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }

  /** Run the full curation DAG over `docs` (expects `doc_id`, `text`,
    * `lang`, `source` columns). `benchSource` is held out as the benchmark
    * set and its n-grams are scrubbed from the rest. Returns per-packed-
    * sequence stats keyed by (split, source, shard) — aggregate or join
    * back by id downstream. Stage order is load-bearing: exact dedup runs
    * BEFORE near-dup pair generation because un-deduped LSH/prefix
    * pair-gen is quadratic in replica depth (measured in ScaleProbe;
    * SCALE.md §dedup ordering).
    */
  def curate(docs: DataFrame, benchSource: String,
             seam: Seam = LocalSeam): DataFrame = {
    val exact = seam.materialize(
      Dedup.exactDedup(docs, "doc_id", "text"), "s1_exact_dedup")
    val pairs = Dedup.jaccardPairs(exact, "doc_id", "text",
      Seq("lang", "source"), n = 1, threshold = 0.9)
    val uniq = Components.survivors(
      exact, pairs.select("id_a", "id_b"), "doc_id")
    val bench = docs.where(col("source") === benchSource)
    val clean = Decontaminate.decontaminate(
      uniq.where(col("source") =!= benchSource), bench, "doc_id", "text", n = 4)
    val scored = seam.materialize(
      clean.withColumn("q",
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text")))),
      "s2_scored")
    val gated = Gate.topHalf(scored, "source", "q")
    val split = Sampling.splitAssign(gated, "doc_id",
      Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625))
    Pack.packStats(
      split.withColumn("shard", Sampling.shardFromId(col("doc_id"), 8)),
      "doc_id", Seq("split", "source", "shard"),
      TextAnalysis.tokenCount(col("text")), budget = 256)
  }
}
