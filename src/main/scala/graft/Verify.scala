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
    // Plan-regression gate (round-7 verdict task 8): with per-query
    // cooled-pass bands on record (BENCH_BANDS.json, same table
    // graft.Bench re-measures against), a query running >2x its band
    // HERE — on a cooled host, at the smaller verify SF, before the
    // driver bench — is a plan regression, not host noise, and should
    // fail loudly in the builder's loop. Skipped when the host is under
    // load (the flag would be noise) or no band exists.
    // Bands are sf0.1 floors; at larger fixtures (the sf1 replay) rows
    // legitimately exceed them, so the gate only arms at gate-or-bench SF.
    val bands: Map[String, Double] =
      if (sfDir.contains("sf0.01") || sfDir.contains("sf0.1")) BenchBands.load()
      else Map.empty
    // Both loadavg windows, like graft.Bench's cooldown gate: the 1-min
    // average recovers seconds after a JVM exit while the host's memory
    // daemons keep inflating timings for minutes on the 5-min window —
    // a regression flag armed on 1-min alone fires on that noise (a
    // post-test-suite verify flagged v17 at 2.7x band from exactly this).
    val hostCooled: Boolean = {
      val parts = scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+"))
        .getOrElse(Array("0", "0"))
      val l1 = parts.headOption.flatMap(_.toDoubleOption).getOrElse(0.0)
      val l5 = parts.lift(1).flatMap(_.toDoubleOption).getOrElse(0.0)
      l1 < 1.0 && l5 < 1.5
    }
    val regressions = scala.collection.mutable.ArrayBuffer.empty[String]
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
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val secs = (System.nanoTime() - t0) / 1e9
        // Bands are recorded at bench SF (sf0.1) on 32 cores; verify runs
        // smaller/narrower, so >2x the BENCH band here is a conservative
        // flag — any true plan regression blows far past it.
        bands.get(name).filter(b => hostCooled && secs > b * 2 + 0.5)
          .foreach { b =>
            regressions += f"$name: $secs%.2fs vs band $b%.2fs"
            System.err.println(
              f"[verify] BAND REGRESSION $name: $secs%.2fs > 2x band $b%.2fs")
          }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Streaming queries leave their just-stopped run's state-store
      // providers in the global registry; unload per query so the
      // family's tail never pays a grown maintenance sweep (same
      // rationale as graft.Bench.streamingFamily).
      if (fam == "st") Caches.unloadStreamState()
    }
    // The gate must be machine-visible, not just a stderr line a log
    // scroll buries: regressions land in a JSON artifact next to the
    // query outputs (tools/check.py and the builder loop read outDir
    // anyway), and GRAFT_VERIFY_BAND_STRICT=1 turns them into a non-zero
    // exit for loops that only check status codes. Exit stays 0 by
    // default so a deliberately-hot exploratory run or the driver's own
    // invocation cannot be failed by host noise.
    if (regressions.nonEmpty) {
      System.err.println(s"[verify] ${regressions.size} band regression(s): " +
        regressions.mkString("; "))
      Files.writeString(Paths.get(s"$outDir/band_regressions.json"),
        regressions.map(r => "\"" + r.replace("\"", "'") + "\"")
          .mkString("[", ",", "]"))
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
    if (regressions.nonEmpty &&
        sys.env.get("GRAFT_VERIFY_BAND_STRICT").contains("1"))
      sys.exit(3)
  }
}
