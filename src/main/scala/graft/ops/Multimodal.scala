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
    * derived from non-overlapping windows of the payload's sha256 hex
    * digest, so tests get stable, content-dependent values with zero
    * native dependencies — and any engine that can compute sha256
    * reproduces them exactly (which is how the DuckDB oracle checks the
    * decode query end-to-end).
    *
    * Digest layout (hex offsets, 6 chars = 24 bits each, always >= 0):
    * [0,6) width, [6,12) height, [12,18) duration, [18,24) channels,
    * [24 + 2i, 30 + 2i) feature i — so featureDim <= 17 fits in 64 chars.
    */
  final class FakeDecoder(val featureDim: Int = 16) extends MediaDecoder {
    require(featureDim <= 17, "sha256 digest supports at most 17 feature windows")
    override def decode(item: MediaItem): Option[DecodedMedia] = {
      if (item.payload == null || item.payload.isEmpty) return None
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(item.payload).map(b => f"${b & 0xff}%02x").mkString
      def h(off: Int): Long = java.lang.Long.parseLong(hex.substring(off, off + 6), 16)
      val feature = Array.tabulate(featureDim) { i =>
        (h(24 + 2 * i) % 1000).toInt / 1000.0f
      }
      Some(DecodedMedia(
        media_id = item.media_id,
        kind = item.kind,
        width = if (item.kind == "audio") 0 else (64 + h(0) % 512).toInt,
        height = if (item.kind == "audio") 0 else (64 + h(6) % 512).toInt,
        duration_ms = if (item.kind == "image") 0L else 1000L + h(12) % 60000L,
        channels = (1 + h(18) % 4).toInt,
        feature = feature))
    }
  }

  /** REAL image decoding over the public JDK's `javax.imageio` readers
    * (PNG, JPEG, GIF, BMP — no native dependencies): true pixel
    * dimensions, the color model's channel count, and a grid-mean-pooled
    * RGB feature (`featureDim = 3 * grid * grid`, values in [0, 1]) — the
    * standard cheap content embedding for near-dup/clustering before a
    * learned encoder enters the pipeline.
    *
    * Non-image kinds and undecodable payloads return None (total, never
    * throws), so one corrupt file cannot fail a 100 TB decode pass. The
    * [[FakeDecoder]] remains the ORACLE-side decoder: a cross-engine
    * correctness gate needs a decode DuckDB can replay (sha256 windows),
    * which real pixel decoding is not — MultimodalSpec pins this decoder
    * against in-memory rendered images and committed PNG/JPEG fixtures
    * instead.
    */
  final class ImageIoDecoder(val grid: Int = 2) extends MediaDecoder {
    require(grid >= 1 && grid <= 8, "grid must be 1..8")
    override def featureDim: Int = 3 * grid * grid

    override def decode(item: MediaItem): Option[DecodedMedia] = {
      if (item.kind != "image" || item.payload == null || item.payload.isEmpty)
        return None
      try {
        Multimodal.imageIoNoDiskCache
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(item.payload))
        if (img == null) return None // no registered reader for the format
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) return None
        // Mean-pool RGB over a grid x grid tiling. One pass over the
        // pixels; cell index derives from integer ratios so every pixel
        // lands in exactly one cell regardless of dimensions.
        val cells = grid * grid
        val sums = new Array[Long](cells * 3)
        val counts = new Array[Long](cells)
        var y = 0
        while (y < h) {
          val cy = y * grid / h
          var x = 0
          while (x < w) {
            val cell = cy * grid + x * grid / w
            val rgb = img.getRGB(x, y)
            sums(cell * 3) += (rgb >> 16) & 0xff
            sums(cell * 3 + 1) += (rgb >> 8) & 0xff
            sums(cell * 3 + 2) += rgb & 0xff
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feature = Array.tabulate(cells * 3) { i =>
          val n = counts(i / 3)
          if (n == 0) 0.0f else (sums(i).toDouble / n / 255.0).toFloat
        }
        Some(DecodedMedia(
          media_id = item.media_id,
          kind = item.kind,
          width = w,
          height = h,
          duration_ms = 0L,
          channels = img.getColorModel.getNumComponents,
          feature = feature))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Executed once per JVM before the first decode: in-memory streams
    * only — the default ImageIO disk cache writes scratch files per
    * decode, a per-row filesystem tax an executor-side batch decode
    * cannot afford.
    */
  @transient private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL audio decoding over the public JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU PCM — no native dependencies): true sample rate,
    * channel count, duration from the frame count, and a windowed
    * RMS-energy feature — `featureDim` equal-width windows over the
    * first channel, each the root-mean-square of its samples normalized
    * to [0, 1]. RMS-energy envelopes are the standard cheap audio
    * fingerprint for silence trimming / near-dup bucketing before a
    * learned encoder enters the pipeline.
    *
    * Decoding streams the frames once (no full-clip buffer beyond the
    * payload itself, which already sits in the row); 8/16/24/32-bit
    * signed and 8-bit unsigned PCM are handled, compressed encodings
    * return None. Non-audio kinds and undecodable payloads return None
    * (total, never throws) — one corrupt file cannot fail a 100 TB
    * decode pass. [[FakeDecoder]] remains the ORACLE-side decoder (the
    * cross-engine gate needs sha256 windows DuckDB can replay);
    * MultimodalSpec pins this decoder against synthesized WAV clips with
    * known sine/silence structure.
    */
  final class AudioWavDecoder(val featureDim: Int = 16) extends MediaDecoder {
    require(featureDim >= 1 && featureDim <= 64, "featureDim must be 1..64")

    override def decode(item: MediaItem): Option[DecodedMedia] = {
      if (item.kind != "audio" || item.payload == null || item.payload.isEmpty)
        return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(item.payload))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!signed && !unsigned) return None // compressed — needs a codec
          val bits = fmt.getSampleSizeInBits
          if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
          val channels = fmt.getChannels
          val frames = in.getFrameLength
          if (frames <= 0 || channels <= 0 || fmt.getFrameRate <= 0 ||
            fmt.getFrameSize <= 0) return None
          val durationMs = (frames * 1000.0 / fmt.getFrameRate).toLong
          val bytesPerSample = bits / 8
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val fullScale = ((1L << (bits - 1)) - 1).toDouble

          // One streaming pass: frame i lands in window i*featureDim/frames.
          val sumSq = new Array[Double](featureDim)
          val counts = new Array[Long](featureDim)
          val buf = new Array[Byte](frameSize * 1024)
          var frameIdx = 0L
          var carry = 0 // bytes of a partial frame carried between reads
          var eof = false
          while (!eof) {
            val n = in.read(buf, carry, buf.length - carry)
            if (n <= 0) eof = true
            else {
              val avail = carry + n
              val whole = avail / frameSize * frameSize
              var off = 0
              while (off < whole) {
                // first channel's sample at this frame
                var s = 0L
                if (big) {
                  var b = 0
                  while (b < bytesPerSample) { s = (s << 8) | (buf(off + b) & 0xff); b += 1 }
                } else {
                  var b = bytesPerSample - 1
                  while (b >= 0) { s = (s << 8) | (buf(off + b) & 0xff); b -= 1 }
                }
                val v =
                  if (unsigned) s - (1L << (bits - 1)) // center 8-bit unsigned
                  else { // sign-extend
                    val shift = 64 - bits
                    (s << shift) >> shift
                  }
                val w = math.min(((frameIdx * featureDim) / frames).toInt, featureDim - 1)
                val x = v / fullScale
                sumSq(w) += x * x
                counts(w) += 1
                frameIdx += 1
                off += frameSize
              }
              carry = avail - whole
              if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
            }
          }
          val feature = Array.tabulate(featureDim) { i =>
            if (counts(i) == 0) 0.0f
            else math.min(1.0, math.sqrt(sumSq(i) / counts(i))).toFloat
          }
          Some(DecodedMedia(
            media_id = item.media_id,
            kind = item.kind,
            width = 0,
            height = 0,
            duration_ms = durationMs,
            channels = channels,
            feature = feature))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Perceptual image fingerprint — dHash (difference hash) over a 9x8
    * box-mean gray thumbnail: bit (r, c) is set when gray(r, c+1) is
    * strictly brighter than gray(r, c), giving 8 gradient bits per row x
    * 8 rows = 64 bits that survive resizing, re-encoding, and brightness
    * shifts (gradients are scale- and offset-invariant) — the standard
    * cheap image near-dup key before a learned encoder enters the
    * pipeline. Returned as two 32-bit halves in longs (rows 0-3 / 4-7)
    * so downstream hamming math stays in non-negative space on any
    * engine. None for non-images/undecodable payloads, like the
    * decoders.
    */
  def dHash(payload: Array[Byte]): Option[(Long, Long)] = {
    if (payload == null || payload.isEmpty) return None
    try {
      Multimodal.imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      // Box-mean 9x8 gray grid (integer BT.601 luma): one pass, each
      // pixel lands in exactly one cell.
      val sums = new Array[Long](72)
      val counts = new Array[Long](72)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val cell = cy * 9 + x * 9 / w
          val rgb = img.getRGB(x, y)
          sums(cell) += (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val gray = Array.tabulate(72)(i =>
        if (counts(i) == 0) 0L else sums(i) / counts(i))
      Some(dHashBits(gray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The gradient-bit layout shared by the real decoder path and the
    * sha-window stub/oracle path: bit b of half `hi` (b in 0..31, rows
    * 0-3) / `lo` (rows 4-7) is set when gray(r*9+c+1) > gray(r*9+c) for
    * r = b div 8, c = b mod 8.
    */
  def dHashBits(gray: Array[Long]): (Long, Long) = {
    require(gray.length == 72, "dHash needs a 9x8 gray grid")
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      val base = (b / 8) * 9 + b % 8
      if (gray(base + 1) > gray(base)) {
        if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  /** Hamming near-dup pairs over 64-bit perceptual hashes carried as two
    * 32-bit halves — the image twin of the SimHash text path (d03): any
    * pair within hamming distance 3 shares at least one of the four
    * 16-bit segments (pigeonhole), so candidates come from a segment-
    * keyed equi-join — each hash shuffles exactly 4 rows, no cross join
    * at any corpus size — and the exact `bit_count` verify keeps only
    * true hits. Recall is exact (not probabilistic) for maxHam <= 3,
    * which is why the bound is enforced; higher radii need more/wider
    * segments, the multi-index tradeoff of Norouzi et al.'s MIH
    * (CVPR'12).
    */
  def hammingPairs(df: DataFrame, idCol: String, hiCol: String,
      loCol: String, maxHam: Int): DataFrame = {
    require(maxHam >= 0 && maxHam <= 3,
      "4x16-bit pigeonhole is exact only for maxHam <= 3")
    val segs = array(
      struct(lit(0).as("k"), col(hiCol).bitwiseAND(lit(65535L)).as("v")),
      struct(lit(1).as("k"), shiftright(col(hiCol), 16).as("v")),
      struct(lit(2).as("k"), col(loCol).bitwiseAND(lit(65535L)).as("v")),
      struct(lit(3).as("k"), shiftright(col(loCol), 16).as("v")))
    val keyed = df.select(col(idCol), col(hiCol), col(loCol),
        explode(segs).as("seg"))
      .select(col(idCol), col(hiCol), col(loCol),
        col("seg.k").as("k"), col("seg.v").as("v"))
    val a = keyed.select(col(idCol).as("id_a"), col(hiCol).as("hi_a"),
      col(loCol).as("lo_a"), col("k"), col("v"))
    val b = keyed.select(col(idCol).as("id_b"), col(hiCol).as("hi_b"),
      col(loCol).as("lo_b"), col("k"), col("v"))
    a.join(b, Seq("k", "v")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("hi_a"), col("lo_a"),
        col("hi_b"), col("lo_b"))
      .distinct() // a pair sharing >1 segment is one candidate, not many
      .withColumn("ham",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"))
      .filter(col("ham") <= maxHam)
      .select(col("id_a"), col("id_b"), col("ham"))
  }

  /** Energy-based voice-activity segments over a decoded clip's RMS
    * envelope (the feature array [[AudioWavDecoder]] and [[FakeDecoder]]
    * both emit): contiguous runs of windows at-or-above `threshold` are
    * speech/activity segments, below is silence — the standard
    * silence-trim / segmentation pass a speech-data pipeline runs before
    * transcription or an acoustic encoder. One row per segment with
    * window bounds [win_start, win_end) plus exact-integer millisecond
    * bounds (window w of n spans [duration*w/n, duration*(w+1)/n) — same
    * floor arithmetic on every engine).
    *
    * Map-only: the island scan is a local pass over the fixed-size
    * envelope inside flatMap, so segmentation adds ZERO shuffles to a
    * decode pass at any corpus size.
    */
  def energySegments(decoded: Dataset[DecodedMedia], threshold: Float): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { d =>
      val n = d.feature.length
      segmentBounds(d.feature, threshold).zipWithIndex.map {
        case ((s, e), idx) =>
          (d.media_id, idx, s, e,
            d.duration_ms * s / n, d.duration_ms * e / n)
      }
    }.toDF("media_id", "seg_idx", "win_start", "win_end",
      "start_ms", "end_ms")
  }

  /** Per-clip VAD summary — segment count, active windows, longest run,
    * active milliseconds — folded inside the same map as the island scan:
    * the whole audit is one shuffle-free pass over the decoded Dataset.
    */
  def vadSummary(decoded: Dataset[DecodedMedia], threshold: Float): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val segs = segmentBounds(d.feature, threshold)
      val active = segs.map(s => s._2 - s._1).sum
      val longest = if (segs.isEmpty) 0 else segs.map(s => s._2 - s._1).max
      val n = math.max(d.feature.length, 1)
      (d.media_id, d.duration_ms, segs.length.toLong, active.toLong,
        longest.toLong, d.duration_ms * active / n)
    }.toDF("media_id", "duration_ms", "n_segments", "active_windows",
      "longest_run", "active_ms")
  }

  /** Maximal [start, end) runs of envelope values >= threshold. */
  private def segmentBounds(envelope: Array[Float], threshold: Float)
      : List[(Int, Int)] = {
    val out = List.newBuilder[(Int, Int)]
    var start = -1
    var i = 0
    while (i < envelope.length) {
      if (envelope(i) >= threshold) { if (start < 0) start = i }
      else if (start >= 0) { out += ((start, i)); start = -1 }
      i += 1
    }
    if (start >= 0) out += ((start, envelope.length))
    out.result()
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

  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      out_width: Int,
      out_height: Int,
      feature: Array[Float])

  /** Resize plumbing: fit each decoded item's dimensions into a
    * `maxDim`-sided box preserving aspect ratio (integer arithmetic —
    * floor((side * maxDim) / longest) — so any engine reproduces the
    * output dims exactly). Items already inside the box, and audio items
    * (0x0), pass through unchanged. The pixel work of a real resize lives
    * where decode does — behind the codec boundary on executors; what the
    * engine owns is this metadata/layout transform, which is why it is a
    * typed map with no shuffle.
    */
  def resizeToFit(decoded: Dataset[DecodedMedia], maxDim: Int): Dataset[ResizedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val longest = math.max(d.width, d.height)
      val (ow, oh) =
        if (longest <= maxDim) (d.width, d.height)
        else ((d.width.toLong * maxDim / longest).toInt,
          (d.height.toLong * maxDim / longest).toInt)
      ResizedMedia(d.media_id, d.kind, d.width, d.height, ow, oh, d.feature)
    }
  }

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
