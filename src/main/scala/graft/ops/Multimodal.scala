package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * The decode step itself is STUBBED — this container ships no image/audio
  * codecs — behind [[MediaDecoder]], with a deterministic fake
  * implementation so the Spark-side contract (schema, batch shape,
  * partition-parallel execution, null handling) is real and tested. A
  * production deployment swaps [[FakeDecoder]] for a JNI/FFI codec without
  * touching any plan.
  *
  * Scale notes: media bytes never pass through a shuffle — decode runs
  * `mapPartitions` directly over the scan, metadata-only columns are
  * projected before any join, and feature vectors (small, fixed-size) are
  * what flows downstream.
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope. */
  final case class MediaItem(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,              // image/video: pixels; audio: 0
      height: Int,
      duration_ms: Long,       // audio/video: duration; image: 0
      channels: Int,
      feature: Array[Float])   // fixed-dim content embedding

  /** The pluggable decode/feature-extract boundary. Implementations must
    * be serializable (executed inside mapPartitions on executors) and
    * total: undecodable payloads return None, never throw.
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(item: MediaItem): Option[DecodedMedia]
  }

  /** Deterministic stand-in for a real codec: dimensions and features are
    * derived from a rolling hash of the payload, so tests get stable,
    * content-dependent values with zero native dependencies.
    */
  final class FakeDecoder(val featureDim: Int = 16) extends MediaDecoder {
    override def decode(item: MediaItem): Option[DecodedMedia] = {
      if (item.payload == null || item.payload.isEmpty) return None
      var h = 1125899906842597L
      item.payload.foreach { b => h = 31 * h + (b & 0xff) }
      def mix(k: Int): Long = {
        var z = h + k * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z ^ (z >>> 31)
      }
      val feature = Array.tabulate(featureDim) { i =>
        (mix(i) % 1000).toFloat / 1000.0f
      }
      Some(DecodedMedia(
        media_id = item.media_id,
        kind = item.kind,
        width = if (item.kind == "audio") 0 else 64 + (mix(100) % 512).toInt.abs,
        height = if (item.kind == "audio") 0 else 64 + (mix(101) % 512).toInt.abs,
        duration_ms = if (item.kind == "image") 0L else 1000L + (mix(102) % 60000L).abs,
        channels = 1 + (mix(103) % 4).toInt.abs,
        feature = feature))
    }
  }

  /** Decode a media Dataset partition-parallel. Undecodable rows are
    * dropped (total function; no task failures from bad payloads).
    */
  def decodeAll(media: Dataset[MediaItem], decoder: MediaDecoder): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decoder.decode))
  }

  /** Typed metadata envelope over a raw binary DataFrame: wraps columns
    * into the MediaItem shape with payload size/hash audit columns, without
    * moving the payload.
    */
  def describe(media: DataFrame, idCol: String, payloadCol: String): DataFrame =
    media.select(
      col(idCol).as("media_id"),
      length(col(payloadCol)).as("payload_bytes"),
      sha2(col(payloadCol), 256).as("payload_sha256"))

  /** Deterministic frame sampling for video stubs: pick `n` payload slices
    * (stand-ins for decoded frames) at evenly spaced offsets. The real
    * implementation would emit one row per decoded frame; the plumbing —
    * explode to (media_id, frame_idx, frame_payload) — is identical.
    */
  def sampleFrames(media: Dataset[MediaItem], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { item =>
      val len = if (item.payload == null) 0 else item.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = (len.toLong * i / n).toInt
        val end = math.min(off + math.max(len / n, 1), len)
        (item.media_id, i, item.payload.slice(off, end))
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }
}
