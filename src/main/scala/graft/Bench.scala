package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale factor
  * and prints one JSON line for the driver
  * ({"metric","value","unit","queries","sf"}).
  *
  * Measurement rules (each learned from a round-over-round regression):
  *
  *  - Warm-up is interleaved per query: each query runs once at sf0.001
  *    immediately before its timed runs, so the timed numbers measure the
  *    plan, not JVM/classloader/codegen first-touch.
  *  - Each query is timed twice at the target scale and the best run is
  *    reported: local[32] single-JVM runs carry ±2-3x per-query GC/JIT
  *    noise, and the min of two is the steady-state estimate. A run that
  *    throws contributes NO timing — a query whose every run failed
  *    reports -1, never a fast-looking time-to-exception.
  *  - The generated-class cache is raised from its 100-entry default: this
  *    suite executes 200+ distinct queries x 3 runs, each compiling many
  *    codegen units, and at too-small sizes classes are evicted between a
  *    query's warm-up and its timed runs, re-measuring Janino compilation
  *    instead of execution (round 3 at 100 entries; recurred at 3000 when
  *    the surface passed ~215 queries — t12 measured 19.6 s in-suite vs
  *    1.7 s isolated, with the slow set reshuffling every run as LRU
  *    eviction order changed).
  *  - [[Caches.reset]] runs at every query-family boundary: families
  *    deliberately share persisted artifacts (pair relations, IVF index,
  *    fingerprint postings) WITHIN the family, but letting them accumulate
  *    across all 95 queries pins gigabytes of block-manager storage and
  *    was measured as a 3.7x whole-suite slowdown in round 3 (mid-suite
  *    aggregates at 10-30x their isolated cost).
  */
object Bench {
  /** Family key: the leading letters of the query name ("d01" -> "d",
    * "st03" -> "st"). Queries run in sorted name order, so each family is
    * contiguous and its shared artifacts die at the boundary.
    */
  private def family(name: String): String = name.takeWhile(!_.isDigit)

  /** The suite JITs ~200 MB of generated-code nmethods; under the JDK
    * default 240 MB ReservedCodeCacheSize the profiled segment saturates
    * and code-cache flushing deoptimizes hot code mid-suite — random
    * late-suite queries then re-measure interpreter cost at 10-50x
    * (BENCH_NOTES round 6). sbt-forked runs get the flag from
    * build.sbt's javaOptions; a bare `java -cp ... graft.Bench` (how a
    * measurement harness typically invokes the main) does not — so when
    * the reserved cache is small, re-exec once with the flag, inheriting
    * everything else. Any spawn failure falls through to running inline.
    */
  private def ensureCodeCache(args: Array[String]): Boolean = {
    if (sys.env.contains("GRAFT_BENCH_NO_REEXEC")) return false
    import scala.jdk.CollectionConverters._
    val reservedMb = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getName.startsWith("CodeHeap"))
      .map(p => Option(p.getUsage).map(_.getMax).getOrElse(0L)).sum / (1 << 20)
    if (reservedMb >= 384) return false
    try {
      val javaBin = new java.io.File(new java.io.File(
        sys.props("java.home"), "bin"), "java").getAbsolutePath
      val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala
        .filterNot(_.startsWith("-XX:ReservedCodeCacheSize"))
      val cmd = Seq(javaBin) ++ inherited ++ Seq(
        "-XX:ReservedCodeCacheSize=512m",
        "-cp", sys.props("java.class.path"), "graft.Bench") ++ args
      val pb = new ProcessBuilder(cmd.asJava).inheritIO()
      pb.environment().put("GRAFT_BENCH_NO_REEXEC", "1")
      val code = pb.start().waitFor()
      sys.exit(code)
    } catch {
      case _: Exception => false // fall through: measure inline, flushed or not
    }
  }

  /** Per-query cooled-pass floor bands (seconds): BENCH_BANDS.json at the
    * repo root (or GRAFT_BENCH_BANDS), written by the builder from
    * repo-pass forensics each round. The round-7 driver bench proved the
    * absolute 2 s re-measure threshold insufficient: a host-pressure spike
    * can inflate a 0.8 s query to 1.9 s and still ship — below 2 s, yet
    * 2.4x its floor. With a band on record, any timing above
    * 1.5 x band ALSO triggers the adaptive re-measure, so the artifact of
    * record reports the plan's floor, not the launch context.
    */
  private def loadBands(sfDir: String): Map[String, Double] = {
    // Bands are floors AT THE RECORDED SF (sf0.1, the driver's bench SF).
    // Against a different fixture (the sf1 scaling runs) every row would
    // sit legitimately above its band and trigger wasted re-measures.
    if (!sfDir.contains("sf0.1")) return Map.empty
    BenchBands.load()
  }

  /** Streaming queries re-provision their state stores EVERY run (fresh
    * temp checkpoints), so each run's providers become dead registry
    * entries the moment the query stops. At family boundaries the
    * registry is cleared, but WITHIN the st family 19 queries x 3 runs x
    * 8 state partitions x 1-4 stores/operator accumulate hundreds of
    * dead RocksDB providers — and the queries that sort LAST in the
    * family (st13-st19, the transformWithState set) pay the growing
    * maintenance sweep. The round-6 driver bench measured exactly that
    * shape: st15 0.95 -> 5.58 s, st13/16/17/18/19 at 2-4.5 s, while
    * family-isolated runs of the same commit sat at their ~1-2 s floors.
    * Unloading after EVERY streaming query keeps the registry O(one
    * query) instead of O(family); no stream is active between queries,
    * and the provider pool + maintenance task restart lazily.
    */
  private def streamingFamily(fam: String): Boolean =
    fam == "st" && !sys.env.get("GRAFT_BENCH_STREAM_UNLOAD").contains("family")

  /** This host runs kernel memory daemons (kdamond/kcompactd) whose
    * loadavg swings 0-4.5 and decays over MINUTES after every heavy JVM
    * exits — and the driver invokes this bench right after a full
    * compile/verify cycle. Benches started at loadavg > ~1 measured
    * 1.3-4x inflations concentrated wherever the suite was when pressure
    * peaked (BENCH_NOTES round-6 forensics). A bounded pre-flight
    * cooldown (poll /proc/loadavg, sleep until the 1-minute load drops
    * below 1.0 or the budget runs out) measures the plans, not the
    * previous process's memory-compaction wake. Skipped when the proc
    * file is absent (non-Linux) or GRAFT_BENCH_NO_COOLDOWN is set.
    */
  /** @return (seconds waited, 1-min load at entry, 1-min load at exit) —
    *         reported in the bench JSON so the artifact records the launch
    *         context it was measured under.
    */
  private def coolDown(capMs: Long = Long.MaxValue): (Long, Double, Double) = {
    if (sys.env.contains("GRAFT_BENCH_NO_COOLDOWN")) return (0L, 0.0, 0.0)
    val proc = new java.io.File("/proc/loadavg")
    if (!proc.isFile) return (0L, 0.0, 0.0)
    def read(): (Double, Double) = {
      val parts = scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(proc.toPath))
          .split("\\s+")).getOrElse(Array("0", "0"))
      (parts.headOption.flatMap(_.toDoubleOption).getOrElse(0.0),
        parts.lift(1).flatMap(_.toDoubleOption).getOrElse(0.0))
    }
    val (l1Entry, _) = read()
    // The suite start is BLOCKED until the 1-minute load is below 1.0
    // (round-8 verdict task 1: a best-effort wait shipped five rows at
    // 1.6-2.8x their cooled bands). The budget is a safety valve against
    // a host that is genuinely busy with something other than post-JVM
    // decay — 25 min covers every decay curve observed in BENCH_NOTES
    // (the longest, a full verify cycle's kcompactd wake, was ~7 min);
    // only if it trips does the suite run hot, and then the per-row
    // pressure annotation (see main) marks the artifact as such.
    val budgetMs = math.min(capMs, sys.env.get("GRAFT_BENCH_COOLDOWN_MS")
      .flatMap(_.toLongOption).getOrElse(1500000L))
    val t0 = System.nanoTime()
    val deadline = t0 + budgetMs * 1000000L
    var l1 = 0.0
    var l5 = 0.0
    var waited = false
    while ({
      val (a, b) = read()
      l1 = a; l5 = b
      // Gate on the 5-minute average too: a bench launched right after a
      // compile/verify cycle sees 1-min load recover in seconds while the
      // host's memory daemons are still working off the pressure — those
      // passes measured random 3-6x rows with a clean 1-min load
      // (BENCH_NOTES round 7). Tightened from 1.5 to 1.0 after BENCH_r09
      // (entered at load 4.50, started at 1-min 0.23 under a warm 5-min)
      // still shipped 22 pressure-annotated rows — the 5-min window is
      // the one that predicts residual daemon work.
      (l1 > 1.0 || l5 > 1.0) && System.nanoTime() < deadline
    }) {
      if (!waited) System.err.println(
        f"## bench cooldown: loadavg $l1%.2f/$l5%.2f (1m/5m), blocking until 1m<1.0 (budget ${budgetMs / 1000}s)")
      waited = true
      Thread.sleep(5000)
    }
    if (waited) System.err.println(f"## bench cooldown done: loadavg $l1%.2f/$l5%.2f")
    ((System.nanoTime() - t0) / 1000000000L, l1Entry, l1)
  }

  def main(args: Array[String]): Unit = {
    if (ensureCodeCache(args)) return
    val (cooldownS, loadEntry, loadStart) = coolDown()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Static conf — must be set before the first session exists. Sized
      // FROM the surface (~150 codegen classes per query covers warm-up +
      // 2 timed runs with headroom), floored at the hand-tuned 30000 that
      // fixed the round-5 recurrence — a widened surface can no longer
      // silently reintroduce LRU thrash (the round-3/round-5 disease:
      // victims re-measure Janino compilation, and the slow set reshuffles
      // every run as eviction order changes).
      .config("spark.sql.codegen.cache.maxEntries",
        math.max(30000, SparkEntry.queries.size * 150).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // The status listener retains 1000 jobs/stages/executions by
      // default even with the UI off. A 234-query suite (each query: a
      // warm-up + 2 timed runs; each streaming run: a job PER
      // MICRO-BATCH) saturates those rings early, and every later
      // event pays eviction + lookup against the bloated store on the
      // listener-bus thread — which streaming queries, whose
      // micro-batch cadence rides that bus, feel hardest (the st-family
      // measured 2-5x its family-isolated floors late in full-suite
      // runs). Keep just enough history for post-run debugging.
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.sql.streaming.numRecentProgressUpdates", "10")
    // Streaming scratch on tmpfs when the host has one: every streaming
    // run provisions FRESH temp checkpoint dirs + RocksDB working dirs
    // (nothing carries between the two timed runs), so on a contended
    // disk that per-run mkdir/fsync cost is unbounded noise — the
    // r5 driver measured st10 at 11.8 s vs 1.6 s in repo passes on the
    // same code. tmpfs takes disk contention out of the measurement;
    // shuffle spill also lands there, which at bench SF is MBs.
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val scratch = new java.io.File(shm, "graft-bench-scratch")
      scratch.mkdirs()
      builder
        .config("spark.local.dir", scratch.getAbsolutePath)
        .config("spark.sql.streaming.checkpointLocation",
          new java.io.File(scratch, "ckpt").getAbsolutePath)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() => rm(scratch)))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    val bands = loadBands(sfDir)
    // Dev-only subsetting for fast iteration (the driver never sets this):
    // SPARK_GRAFT_ONLY=regex runs just the matching queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // Rows still above 1.5x their cooled band after the re-measure budget:
    // the artifact must SELF-DESCRIBE residual host pressure (round-8
    // verdict task 1 — BENCH_r08 shipped five such rows with no in-artifact
    // signal). The queries map stays purely numeric for any consumer doing
    // arithmetic; the pressure rows ride in a sibling top-level key, each
    // with the measured min and the band it failed to reach.
    val pressure = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    var prevFamily: String = null
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      val fam = family(name)
      if (prevFamily != null && fam != prevFamily) {
        Caches.reset(spark)
        Caches.unloadStreamState()
        // Let the ContextCleaner reclaim the family's localCheckpoint
        // blocks (freed via weak references, so they need a GC to move).
        System.gc()
      }
      prevFamily = fam
      try fn(spark, warmDir).count()
      catch { case _: Throwable => }
      def timedRun(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      var timings = (0 until 2).flatMap(_ => timedRun())
      // Adaptive re-measure: the cause of a high min-of-2 is either a
      // genuine floor (re-runs stay high, the extras cost seconds) or a
      // transient host-pressure spike (the round-7 passes each inflated a
      // DIFFERENT random 2-3 row set to 3-6 s; re-runs recover the
      // floor). Two triggers: the absolute 2 s report threshold, and —
      // when a cooled-pass band exists for this query — 1.5x the band
      // (BENCH_r07 shipped six sub-2 s rows at 1.7-2.5x their floors
      // that the absolute rule alone could not catch). Either way the
      // reported min is the steady-state estimate the suite exists for.
      val band = bands.get(name)
      def inflated(t: Double): Boolean =
        t > 2.0 || band.exists(b => t > b * 1.5 + 0.05)
      var extra = 0
      while (timings.nonEmpty && inflated(timings.min) && extra < 3) {
        extra += 1
        timings = timings ++ timedRun()
      }
      // Budget exhausted and the row never reached 1.5x band: either the
      // plan regressed or the host stayed hot through all 5 runs. Annotate
      // rather than guess — the reader compares against the band.
      band.filter(b => timings.nonEmpty && timings.min > b * 1.5 + 0.05)
        .foreach(b => pressure(name) = (timings.min, b))
      if (only.isDefined) // diagnostics for dev runs only; keeps stdout JSON-clean
        System.err.println(f"## $name runs: ${timings.map(t => f"$t%.3f").mkString(", ")}")
      // Per-QUERY state hygiene for the streaming family (see
      // streamingFamily): the boundary unload alone lets dead providers
      // accumulate across the 19-query family and tax its tail.
      if (streamingFamily(fam)) Caches.unloadStreamState()
      name -> (if (timings.isEmpty) -1.0 else timings.min)
    }
    // End-of-suite cooled re-pass (round-9 verdict task 4): a row still
    // annotated after its in-suite re-measure budget collected every min
    // while the host — or the suite's own JVM, whose GC/compaction wake
    // IS the pressure late in a 238-query run — was hot. By the time the
    // last family finishes, that pressure has a chance to decay: cool
    // down once more (bounded at 10 min — the artifact should not stall
    // on a genuinely busy host) and give each annotated row two more
    // runs. Rows that now reach their band lose the annotation; the
    // artifact of record then measures plans, not launch context
    // (BENCH_r09 shipped 22 annotated rows measured mid-suite that the
    // builder's cooled pass reproduced at their bands).
    val resultMap = scala.collection.mutable.LinkedHashMap(results: _*)
    if (pressure.nonEmpty) {
      System.err.println(
        s"## re-pass: ${pressure.size} pressure rows after final family")
      Caches.reset(spark)
      Caches.unloadStreamState()
      System.gc()
      coolDown(capMs = 600000L)
      val fns = SparkEntry.queries
      var prevFam2: String = null
      pressure.keys.toSeq.sorted.foreach { name =>
        val fam = family(name)
        if (prevFam2 != null && fam != prevFam2) {
          Caches.reset(spark); Caches.unloadStreamState(); System.gc()
        }
        prevFam2 = fam
        val fn = fns(name)
        val reruns = (0 until 2).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        if (reruns.nonEmpty) {
          val best = math.min(resultMap(name), reruns.min)
          resultMap(name) = best
          val (_, band) = pressure(name)
          if (best <= band * 1.5 + 0.05) pressure.remove(name)
          else pressure(name) = (best, band)
        }
        if (streamingFamily(fam)) Caches.unloadStreamState()
      }
      System.err.println(
        s"## re-pass done: ${pressure.size} rows still annotated")
    }
    val finalResults = results.map { case (k, _) => k -> resultMap(k) }
    // Millisecond precision keeps the whole line under ~1.9k chars for 70+
    // queries so log-tail capture (last ~2k chars) retains it intact.
    def fmt(v: Double): String = f"$v%.3f"
    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total =
      if (finalResults.nonEmpty) finalResults.map(_._2).filter(_ >= 0).sum
      else 0.0
    // Launch-context + residual-pressure self-description (empty pressure
    // map on a clean run). cooldown_s > 0 means the suite blocked that
    // long for the host to cool; load_start is the 1-min loadavg the
    // suite actually started under.
    val press = pressure.map { case (k, (t, b)) =>
      "\"" + k + "\":{\"t\":" + fmt(t) + ",\"band\":" + fmt(b) + ",\"pressure\":true}"
    }.mkString("{", ",", "}")
    val ctx = f""""cooldown_s":$cooldownS,"load_entry":$loadEntry%.2f,"load_start":$loadStart%.2f"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"pressure":$press,$ctx,"sf":"$sfDir"}""")
    // Driver-artifact ingestibility (round-10 verdict task 2): the full
    // line above is the contract artifact, but at 238 queries (~6 KB) it
    // outgrew the driver's ~2 KB log-tail capture — BENCH_r*.json carried
    // parsed:null since round 3. Emit a COMPACT machine line as the LAST
    // stdout line (~1.2 KB at 238 queries, inside the capture window):
    // same metric/value/unit/pressure/sf keys; per-query timings ride in
    // "queries_cs" as CENTISECONDS, positionally aligned with the query
    // names in ascending name order (exactly the order of the full line's
    // "queries" map; -1 = every run of that query failed).
    val cs = finalResults.map { case (_, v) =>
      if (v < 0) "-1" else math.round(v * 100).toString
    }.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${finalResults.size},"queries_order":"name-asc","queries_cs":$cs,"pressure":$press,$ctx,"sf":"$sfDir"}""")
    spark.stop()
  }
}
