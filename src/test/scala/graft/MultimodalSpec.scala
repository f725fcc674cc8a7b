package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{FakeDecoder, MediaItem}

/** Multimodal plumbing: schema, determinism, null-safety, and
  * partition-parallel decode with the stubbed codec.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def item(id: Long, kind: String, bytes: String): MediaItem =
    MediaItem(id, kind, bytes.getBytes("UTF-8"), s"src$id")

  private val items = Seq(
    item(1, "image", "fake-jpeg-bytes-aaaa"),
    item(2, "audio", "fake-wav-bytes-bbbb"),
    item(3, "video", "fake-mp4-bytes-cccc"),
    MediaItem(4, "image", Array.emptyByteArray, "src4")) // undecodable

  test("decodeAll is deterministic, typed, and drops undecodable rows") {
    val ds = spark.createDataset(items).repartition(3)
    val out1 = Multimodal.decodeAll(ds, new FakeDecoder(16)).collect()
      .sortBy(_.media_id)
    val out2 = Multimodal.decodeAll(ds, new FakeDecoder(16)).collect()
      .sortBy(_.media_id)
    assert(out1.map(_.media_id).toSeq === Seq(1L, 2L, 3L)) // id 4 dropped
    assert(out1.forall(_.feature.length == 16))
    // deterministic across runs and partitionings
    assert(out1.zip(out2).forall { case (a, b) =>
      a.media_id == b.media_id && a.feature.toSeq == b.feature.toSeq &&
        a.width == b.width && a.duration_ms == b.duration_ms })
    val img = out1.find(_.media_id == 1L).get
    assert(img.duration_ms === 0L && img.width > 0)
    val aud = out1.find(_.media_id == 2L).get
    assert(aud.width === 0 && aud.duration_ms > 0L)
  }

  test("describe audits payloads without decoding") {
    val df = spark.createDataset(items.take(2)).toDF()
    val out = Multimodal.describe(df, "media_id", "payload")
      .orderBy($"media_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out.head.getInt(1) === "fake-jpeg-bytes-aaaa".length)
    assert(out.head.getString(2).length === 64) // sha256 hex
  }

  test("sampleFrames emits n evenly spaced slices per item") {
    val ds = spark.createDataset(Seq(item(7, "video", "0123456789abcdef")))
    val frames = Multimodal.sampleFrames(ds, 4).orderBy($"frame_idx").collect()
    assert(frames.length === 4)
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3))
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_payload"))
      .map(_.toChar).mkString
    assert(joined === "0123456789abcdef") // slices tile the payload
  }

  test("resizeToFit preserves aspect ratio and passes small/audio through") {
    import Multimodal.DecodedMedia
    val decoded = spark.createDataset(Seq(
      DecodedMedia(1, "image", 512, 256, 0, 1, Array(0.1f)),   // 2:1 landscape
      DecodedMedia(2, "image", 100, 400, 0, 1, Array(0.2f)),   // 1:4 portrait
      DecodedMedia(3, "image", 200, 100, 0, 1, Array(0.3f)),   // already fits
      DecodedMedia(4, "audio", 0, 0, 5000, 2, Array(0.4f))))   // no dims
    val out = Multimodal.resizeToFit(decoded, maxDim = 256)
      .collect().sortBy(_.media_id)
      .map(r => (r.media_id, r.out_width, r.out_height)).toSeq
    assert(out === Seq(
      (1L, 256, 128),   // scaled by 256/512
      (2L, 64, 256),    // scaled by 256/400: floor(100*256/400)=64
      (3L, 200, 100),   // unchanged
      (4L, 0, 0)))      // audio unchanged
  }
}
