package graft

/** Shared loader for the per-query cooled-pass floor bands
  * (`BENCH_BANDS.json` at the repo root, or `GRAFT_BENCH_BANDS`), written
  * by the builder from repo-pass forensics each round. [[Bench]]
  * re-measures any row above 1.5x its band; [[Verify]] flags >2x band on
  * a cooled host as a plan regression.
  *
  * One real JSON parse shared by both consumers: the earlier regex
  * extraction matched any `"word": number` pair anywhere in the file
  * text — including inside string values such as the `_comment` field —
  * so a number-bearing metadata field would silently have become a
  * phantom band, and the two private copies could drift.
  */
object BenchBands {
  /** Band map, or empty when the file is absent/unreadable. Keys starting
    * with '_' are metadata, never bands. Callers gate by scale factor:
    * bands are floors at the RECORDED SF only.
    */
  def load(): Map[String, Double] = {
    val path = sys.env.getOrElse("GRAFT_BENCH_BANDS", "BENCH_BANDS.json")
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    try {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(f.toPath))) match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(d)) if !k.startsWith("_")  => k -> d
          case (k, JInt(i)) if !k.startsWith("_")     => k -> i.toDouble
          case (k, JDecimal(d)) if !k.startsWith("_") => k -> d.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Exception => Map.empty }
  }
}
