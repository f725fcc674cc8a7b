package graft.oracle

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Result transport envelope — parity with the reference's
  * `Data{compressed, payload}` (proto/sum.proto:112-115): responses larger
  * than 2 KiB are gzip-compressed (node/service/service.go:20-23,
  * 106-124). Inside Spark, shuffle/result compression is native; this
  * envelope exists for the service-facing API surface.
  */
object Payload {

  /** node/service/service.go:20 — gzip threshold in bytes. */
  val GzipThreshold: Int = 2048

  final case class Envelope(compressed: Boolean, payload: Array[Byte]) {
    def size: Int = payload.length
  }

  def build(data: Array[Byte]): Envelope =
    if (data.length > GzipThreshold) {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(data); gz.close()
      Envelope(compressed = true, bos.toByteArray)
    } else Envelope(compressed = false, data)

  def buildString(s: String): Envelope = build(s.getBytes(StandardCharsets.UTF_8))

  def open(e: Envelope): Array[Byte] =
    if (!e.compressed) e.payload
    else {
      val in = new GZIPInputStream(new ByteArrayInputStream(e.payload))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }

  def openString(e: Envelope): String =
    new String(open(e), StandardCharsets.UTF_8)
}
