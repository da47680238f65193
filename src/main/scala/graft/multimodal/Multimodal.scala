package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs partition-batched so a real codec would amortize model /
  * library init per partition, not per row.
  *
  * The actual byte->pixels/samples decode is STUBBED (no image/audio codecs
  * in this environment): [[StubCodec]] derives deterministic pseudo-features
  * from the bytes. Everything Spark-side — schema, partition batching,
  * feature shapes, frame sampling, resize bookkeeping — is real and tested;
  * swapping in a real codec touches only [[MediaCodec]].
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaFile(media_id: Long, kind: String, // image | audio | video
                       bytes: Array[Byte], width: Int, height: Int,
                       duration_ms: Long, mime: String)

  /** Decoded feature row produced by the pipeline. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, features: Array[Float],
                           frames_sampled: Int, out_width: Int, out_height: Int)

  /** Decode contract: bytes -> fixed-dim feature vector. */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decodeFeatures(bytes: Array[Byte], kind: String): Array[Float]
  }

  /** Deterministic stand-in: features are a folded byte histogram. A real
    * implementation (JPEG decode, mel spectrogram, ...) replaces ONLY this.
    */
  final class StubCodec(val featureDim: Int = 64) extends MediaCodec {
    def decodeFeatures(bytes: Array[Byte], kind: String): Array[Float] = {
      val v = new Array[Float](featureDim)
      var i = 0
      while (i < bytes.length) {
        v(java.lang.Byte.toUnsignedInt(bytes(i)) % featureDim) += 1.0f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < featureDim) { v(j) /= n; j += 1 }
      v
    }
  }

  def crc32(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue
  }

  /** Target frame count for video sampling at `fps` on `durationMs`. */
  def framesToSample(durationMs: Long, fps: Double = 1.0): Int =
    math.max(1, math.ceil(durationMs / 1000.0 * fps).toInt)

  /** Aspect-preserving resize bookkeeping to a max edge. */
  def resizeDims(w: Int, h: Int, maxEdge: Int = 224): (Int, Int) = {
    if (w <= 0 || h <= 0) (maxEdge, maxEdge)
    else if (w >= h) (maxEdge, math.max(1, math.round(h.toDouble * maxEdge / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxEdge / h).toInt), maxEdge)
  }

  /** Partition-batched feature extraction. `mapPartitions` (not a per-row
    * UDF) so codec init happens once per partition — the shape that matters
    * when the codec is an actual model. Repartitioning by kind first keeps
    * codec working sets homogeneous per task.
    */
  def extractFeatures(media: Dataset[MediaFile], codec: MediaCodec,
                      maxEdge: Int = 224, fps: Double = 1.0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("kind"))
      .mapPartitions { it =>
        // per-partition codec "init" happens here in a real implementation
        it.map { m =>
          val (ow, oh) = resizeDims(m.width, m.height, maxEdge)
          MediaFeatures(
            media_id = m.media_id, kind = m.kind, n_bytes = m.bytes.length,
            checksum = crc32(m.bytes),
            features = codec.decodeFeatures(m.bytes, m.kind),
            frames_sampled = if (m.kind == "video") framesToSample(m.duration_ms, fps) else 1,
            out_width = ow, out_height = oh)
        }
      }
  }

  /** Deterministic synthetic media corpus (for tests/demos). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val rnd = new scala.util.Random(i)
      val bytes = Array.fill[Byte](128 + (i % 256).toInt)(rnd.nextInt(256).toByte)
      MediaFile(i, kind, bytes, 640 + (i % 7).toInt * 80, 480 + (i % 5).toInt * 60,
        1000L * (1 + i % 30), s"application/x-$kind")
    }
  }
}
