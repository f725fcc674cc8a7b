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

  private def pngBytes(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes real PNGs: true dimensions + pooled RGB") {
    import Multimodal.ImageIoDecoder
    // Left half pure red, right half pure blue: with grid=2 the pooled
    // feature must be red-dominant in cells 0/2 and blue-dominant in 1/3.
    val halves = pngBytes(40, 20)((x, _) => if (x < 20) 0xff0000 else 0x0000ff)
    val solid = pngBytes(7, 13)((_, _) => 0x00ff00) // odd dims, solid green
    val items = Seq(
      MediaItem(1, "image", halves, "s1"),
      MediaItem(2, "image", solid, "s2"),
      MediaItem(3, "image", "not an image at all".getBytes("UTF-8"), "s3"),
      MediaItem(4, "audio", halves, "s4")) // wrong kind: not decoded
    val out = Multimodal.decodeAll(
        spark.createDataset(items).repartition(2), new ImageIoDecoder(grid = 2))
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L)) // 3 undecodable, 4 skipped
    val a = out(0)
    assert((a.width, a.height) === (40, 20))
    assert(a.channels === 3 && a.duration_ms === 0L && a.feature.length === 12)
    // cell 0 (top-left): mean red ~1, blue ~0; cell 1 (top-right): inverse
    assert(a.feature(0) > 0.99f && a.feature(2) < 0.01f)
    assert(a.feature(3) < 0.01f && a.feature(5) > 0.99f)
    val b = out(1)
    assert((b.width, b.height) === (7, 13))
    assert(b.feature.grouped(3).forall(c =>
      c(0) < 0.01f && c(1) > 0.99f && c(2) < 0.01f))
  }

  test("ImageIoDecoder decodes the committed PNG/JPEG fixtures") {
    import Multimodal.ImageIoDecoder
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      assert(in != null, s"missing committed fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val items = Seq(
      MediaItem(1, "image", fixture("gradient_32x16.png"), "fx"),
      MediaItem(2, "image", fixture("gradient_32x16.jpg"), "fx"),
      MediaItem(3, "image", fixture("checker_9x9.png"), "fx"))
    val out = Multimodal.decodeAll(
        spark.createDataset(items), new ImageIoDecoder(grid = 2))
      .collect().sortBy(_.media_id)
    assert(out.length === 3) // both codecs decode
    assert(out.map(d => (d.width, d.height)).toSeq ===
      Seq((32, 16), (32, 16), (9, 9)))
    // PNG and JPEG hold the same gradient: lossy-compressed features agree
    // loosely, dimensions exactly.
    out.take(2).foreach(d => assert(d.feature.length === 12))
    val diff = out(0).feature.zip(out(1).feature)
      .map { case (p, j) => math.abs(p - j) }.max
    assert(diff < 0.05f, s"PNG vs JPEG pooled features diverge: $diff")
  }

  /** Synthesize a PCM WAV in memory via javax.sound.sampled itself:
    * sample(i) in [-1, 1] from the generator, encoded at the given
    * bit depth/endianness, duplicated across channels.
    */
  private def wavBytes(
      sampleRate: Float, bits: Int, channels: Int, nFrames: Int,
      signed: Boolean = true)(gen: Int => Double): Array[Byte] = {
    import javax.sound.sampled._
    val bytesPer = bits / 8
    val fmt = new AudioFormat(sampleRate, bits, channels, signed, false)
    val pcm = new Array[Byte](nFrames * channels * bytesPer)
    val fullScale = (1L << (bits - 1)) - 1
    for (i <- 0 until nFrames; c <- 0 until channels) {
      val v = math.max(-1.0, math.min(1.0, gen(i)))
      val raw =
        if (signed) math.round(v * fullScale)
        else math.round(v * fullScale) + (1L << (bits - 1))
      val off = (i * channels + c) * bytesPer
      var b = 0
      while (b < bytesPer) { pcm(off + b) = ((raw >> (8 * b)) & 0xff).toByte; b += 1 }
    }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioWavDecoder decodes real WAVs: duration, channels, RMS envelope") {
    import Multimodal.AudioWavDecoder
    val rate = 8000f
    // 2 s clip: first second a 440 Hz sine at amplitude 0.5, second silent.
    // RMS of a sine at amplitude a is a/sqrt(2) ~ 0.3536.
    val toneThenSilence = wavBytes(rate, 16, 1, 16000) { i =>
      if (i < 8000) 0.5 * math.sin(2 * math.Pi * 440 * i / rate) else 0.0
    }
    // 8-bit unsigned stereo full-scale square wave: RMS ~ 1 everywhere.
    val square = wavBytes(rate, 8, 2, 4000, signed = false) { i =>
      if (i % 2 == 0) 1.0 else -1.0
    }
    val items = Seq(
      MediaItem(1, "audio", toneThenSilence, "s1"),
      MediaItem(2, "audio", square, "s2"),
      MediaItem(3, "audio", "not audio".getBytes("UTF-8"), "s3"),
      MediaItem(4, "image", toneThenSilence, "s4")) // wrong kind: skipped
    val out = Multimodal.decodeAll(
        spark.createDataset(items).repartition(2), new AudioWavDecoder(8))
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    val a = out(0)
    assert(a.width === 0 && a.height === 0)
    assert(a.duration_ms === 2000L && a.channels === 1)
    assert(a.feature.length === 8)
    // windows 0-3 cover the tone (RMS ~ 0.3536), 4-7 the silence (~ 0)
    a.feature.take(4).foreach(v => assert(math.abs(v - 0.3536f) < 0.01f, v))
    a.feature.drop(4).foreach(v => assert(v < 0.001f, v))
    val b = out(1)
    assert(b.duration_ms === 500L && b.channels === 2)
    b.feature.foreach(v => assert(v > 0.95f, v)) // full-scale square
  }

  test("energySegments finds the planted tone bursts through a REAL decode") {
    import Multimodal.AudioWavDecoder
    val rate = 8000f
    // 4 s clip over a 16-window envelope (250 ms per window):
    // tone [0,1)s -> windows 0-3, silence [1,2)s, tone [2,3)s -> windows
    // 8-11, silence [3,4)s. Amplitude 0.8 -> RMS ~ 0.57 >= 0.3.
    val bursty = wavBytes(rate, 16, 1, 32000) { i =>
      val sec = i / 8000
      if (sec == 0 || sec == 2) 0.8 * math.sin(2 * math.Pi * 440 * i / rate)
      else 0.0
    }
    val ds = spark.createDataset(Seq(MediaItem(1, "audio", bursty, "s")))
    val decoded = Multimodal.decodeAll(ds, new AudioWavDecoder(16))
    val segs = Multimodal.energySegments(decoded, threshold = 0.3f)
      .collect().sortBy(r => r.getInt(1))
      .map(r => (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))
    // Two segments at the planted windows; ms bounds are the exact
    // integer window edges of the 4000 ms clip.
    assert(segs.toSeq === Seq((0, 4, 0L, 1000L), (8, 12, 2000L, 3000L)))
    val sum = Multimodal.vadSummary(decoded, threshold = 0.3f).collect()
    assert(sum.length === 1)
    val r = sum.head
    // (n_segments, active_windows, longest_run, active_ms)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((2L, 8L, 4L, 2000L)))
  }

  test("vadSummary edge cases: all-active, all-silent, empty envelope") {
    import Multimodal.DecodedMedia
    val decoded = spark.createDataset(Seq(
      DecodedMedia(1, "audio", 0, 0, 1600, 1, Array.fill(16)(0.9f)),
      DecodedMedia(2, "audio", 0, 0, 1600, 1, Array.fill(16)(0.1f)),
      DecodedMedia(3, "audio", 0, 0, 1600, 1, Array.empty[Float])))
    val out = Multimodal.vadSummary(decoded, threshold = 0.5f)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 16L, 16L, 1600L), // one wall-to-wall segment
      (2L, 0L, 0L, 0L, 0L),      // nothing above threshold
      (3L, 0L, 0L, 0L, 0L)))     // degenerate envelope, no div-by-zero
  }

  test("AudioWavDecoder matches FakeDecoder's schema through decodeAll") {
    import Multimodal.AudioWavDecoder
    val clip = wavBytes(16000f, 16, 1, 1600)(i => 0.25 * math.sin(i / 10.0))
    val ds = spark.createDataset(Seq(MediaItem(9, "audio", clip, "s")))
    val real = Multimodal.decodeAll(ds, new AudioWavDecoder(16))
    val fake = Multimodal.decodeAll(ds, new FakeDecoder(16))
    assert(real.schema === fake.schema) // drop-in decoder swap
    assert(real.head().duration_ms === 100L)
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
