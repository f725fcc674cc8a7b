package graft.queries

import org.apache.spark.sql.SparkSession

/** Machine-portable scratch and fixture roots.
  *
  * Nothing in src/main may hardcode an absolute checkout path: the sink
  * round-trip queries and streaming sentinel feeds write under
  * `target/graft-io` RELATIVE to the launch directory (the repo root for
  * every sbt-driven surface), overridable per session with the
  * `graft.io.dir` conf key; the multimodal fixture directory resolves the
  * same way with a `GRAFT_FIXTURES_DIR` env override for harnesses that
  * run from elsewhere.
  */
object Scratch {

  /** Session conf key overriding the IO scratch root. */
  val IoDirKey = "graft.io.dir"

  private lazy val defaultIoRoot =
    new java.io.File("target/graft-io").getAbsolutePath

  def ioRoot(s: SparkSession): String = s.conf.get(IoDirKey, defaultIoRoot)

  /** The binary-ingest fixture directory (m06's images). Resolved once:
    * the DuckDB oracle SQL embeds the same absolute path as a literal, so
    * both engines must see one value for the whole process.
    */
  lazy val fixturesDir: String = sys.env.getOrElse("GRAFT_FIXTURES_DIR",
    new java.io.File("src/test/resources/fixtures").getAbsolutePath)
}
