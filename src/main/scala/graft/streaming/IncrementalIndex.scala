package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.embed.Embedder

/** Incremental index maintenance — the Structured Streaming re-expression of
  * the reference's `TARGET_LAG = '1 minute'` service freshness contract
  * (`/root/reference/01_method1_cortex_search.sql:173`, `:228-231`) and the
  * cache-growth write-back loop (`02:415-418`): files appended to the corpus
  * directory are embedded and appended to the index store within one trigger
  * interval; duplicate IDs within the stream are dropped with bounded state
  * (watermark on the ingest timestamp).
  *
  * No event-time windows or late-data semantics exist in the reference —
  * freshness lag is the only obligation — so the default trigger is a simple
  * ProcessingTime("1 minute"); `Trigger.AvailableNow` gives the
  * batch-refresh-on-a-scheduler variant.
  */
object IncrementalIndex {

  /** Streaming embed pipeline over a file source of corpus rows. */
  def stream(spark: SparkSession, sourceDir: String, schema: StructType,
             embedder: Embedder, idCol: String = "ID",
             textCol: String = "EMBED_STR",
             tsCol: String = "CREATED_AT"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .withWatermark(tsCol, "10 minutes")
      .dropDuplicates(idCol, tsCol)
      .withColumn("EMBEDDING",
        when(col(textCol).isNotNull, embedder.embedCol(col(textCol))))

  /** Start the index-maintenance query appending to `indexDir`. */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            embedder: Embedder, indexDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    stream(spark, sourceDir, schema, embedder)
      .writeStream
      .format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}

/** Streaming analytics over the events table shape (ts, user_id, event_type,
  * value): watermarked tumbling-window aggregation — the standard Structured
  * Streaming rollup, included as the engine's stream-aggregation surface.
  */
object EventStream {
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
}
