package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        math.max(30000, SparkEntry.queries.size * 150).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Sorted order + family-boundary cache hygiene, same as graft.Bench:
    // families share persisted artifacts within themselves; across the
    // whole sweep they would accumulate.
    // SPARK_GRAFT_ONLY=regex restricts the dump (local iteration only —
    // the driver never sets it, so the driver always verifies everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    var prevFamily: String = null
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      val fam = name.takeWhile(!_.isDigit)
      if (prevFamily != null && fam != prevFamily) {
        Caches.reset(spark)
        Caches.unloadStreamState()
      }
      prevFamily = fam
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Streaming queries leave their just-stopped run's state-store
      // providers in the global registry; unload per query so the
      // family's tail never pays a grown maintenance sweep (same
      // rationale as graft.Bench.streamingFamily).
      if (fam == "st") Caches.unloadStreamState()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
