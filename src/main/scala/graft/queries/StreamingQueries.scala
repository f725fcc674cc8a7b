package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** Structured Streaming at the correctness gate: each query runs a REAL
  * streaming job (file source -> watermarked stateful transform -> memory
  * sink) to completion with Trigger.AvailableNow, then returns the sink
  * table — so the driver's DuckDB oracle checks the streaming engine's
  * output, not a batch stand-in. StreamingSpec covers the incremental
  * (multi-batch) behavior of the same transforms; these pin end-state
  * equivalence with batch SQL.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  /** State partition count for these single-batch gate runs. Streaming
    * state partitioning is a per-checkpoint provisioning choice (fixed at
    * first run, sized to expected key volume — thousands on a real
    * cluster); locally the HDFS-backed state store pays a fixed
    * delta+snapshot+maintenance cost PER PARTITION PER BATCH that dwarfs
    * the data at gate scale (32 partitions: 5.9 s, 8: 2.2 s for st02), so
    * the gate provisions small.
    */
  private val statePartitions =
    sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse(8)

  /** Run a streaming DataFrame to completion into a uniquely-named memory
    * sink and return the sink table. `parts` overrides the gate's fixed
    * state-partition count for queries whose keyed state grows with the
    * input (the stream-stream joins pass
    * [[EventStreams.statePartitionsFor]]); the env override still wins so
    * A/B runs stay possible.
    */
  private def runToTable(s: SparkSession, df: DataFrame,
      mode: String, parts: Int = statePartitions): DataFrame = {
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val before = s.conf.get("spark.sql.shuffle.partitions")
    val effectiveParts =
      sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse(parts)
    s.conf.set("spark.sql.shuffle.partitions", effectiveParts.toString)
    // RocksDB state store by default: it is the provider a 100 TB keyed
    // state deployment runs (state larger than executor heap, incremental
    // compaction), and measured faster than the HDFS-backed store even at
    // gate scale (st-family 20.6 s -> 17.7 s, median 2.60 -> 2.26 s;
    // BENCH_NOTES §streaming). SPARK_GRAFT_STATE_PROVIDER=hdfs restores
    // the default provider for A/B runs.
    if (!sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("hdfs")) {
      s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Commit = append the version's changelog, not upload a full
      // snapshot zip: stream-stream joins commit 4 stores per partition
      // per batch, and the st05/st11 profile showed commitTimeMs ~= the
      // whole floor (3.7-3.9 s summed across 32 instances PER BATCH with
      // full snapshots). Snapshots still happen, async, in maintenance.
      s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
        ".changelogCheckpointing.enabled", "true")
      // Exact per-store row counts cost a read-before-every-put; the
      // engine only surfaces them as progress metrics. Joins/dedup
      // correctness never reads them.
      s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
        ".trackTotalNumberOfRows", "false")
    }
    try {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Diagnostic: per-micro-batch duration breakdown (addBatch /
      // getBatch / commitOffsets / walCommit / stateStore metrics) for
      // isolating streaming floors. Dev-only; the driver never sets it.
      if (sys.env.contains("SPARK_GRAFT_STREAM_PROGRESS"))
        q.recentProgress.foreach(p => System.err.println(s"## progress ${p.json}"))
    } finally s.conf.set("spark.sql.shuffle.partitions", before)
    s.table(name)
  }

  /** Events-plus-sentinel fixture, written once per (session, sf dir,
    * advance): the real events table with one extra row planted
    * `advanceNs` past the true max event time, under an impossible user
    * id. The sentinel's only job is to advance the final watermark beyond
    * every real window/session's end so append-mode emission is total; it
    * is fixture preparation, not the measured operator, hence the memo.
    * st03 plants gap + lateness + 1 min; st01 plants 2 h (hour-window
    * alignment + lateness, with margin).
    */
  private def sentinelEventsDir(s: SparkSession, dir: String,
      advanceNs: Long): String = {
    val perSession = sentinelDirs.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
    perSession.computeIfAbsent(s"$dir/$advanceNs", _ => {
      val t = Tables(s, dir)
      // Scratch path keyed on the sanitized dir + advance (not hashCode):
      // distinct fixtures can never collide onto one path.
      val scratch =
        s"${Scratch.ioRoot(s)}/sentinel_${advanceNs}_${sanitize(dir)}"
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
        "props").map(col)
      val maxTs = t.events.agg(max(col("ts"))).head.getLong(0)
      val sentinel = s.range(1).select(
        lit(-1L).as("event_id"), lit(maxTs + advanceNs).as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
      t.events.select(cols: _*).unionByName(sentinel)
        .write.mode("overwrite").parquet(scratch)
      scratch
    })
  }

  private val MinuteNs = 60L * 1000000000L

  private def sanitize(path: String): String =
    path.replaceAll("[^A-Za-z0-9._-]", "_")

  // Weak-keyed on the session (like graft.queries.Tables) so stopped
  // sessions do not accumulate; the inner map is per-sf-dir.
  private val sentinelDirs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A GLOB path, not the bare file: for non-glob paths the file-stream
    // source force-injects basePath = the path itself, which then fails
    // the "basePath must be a directory" check on a single-file source.
    EventStreams.withEventTime(
      s.readStream.schema(EventStreams.eventsSchemaFor(s, s"$dir/events.parquet"))
        .option("basePath", dir).parquet(s"$dir/events*.parquet"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Streaming tumbling-window aggregation (q13's streaming twin): the
      // watermarked 1-hour window counts/sums from EventStreams.hourlyStats
      // run as a streaming job in APPEND mode — the sink receives exactly
      // the windows the watermark has closed, the bounded-state shape that
      // runs forever on a real stream (a complete-mode sink retains every
      // window ever seen). A sentinel event 2 h past the true max (hour
      // alignment + lateness + margin) closes the last real window so
      // emission is total and the batch oracle must match exactly; the
      // sentinel's own (still-open) window is filtered by event_type.
      "st01_stream_hourly",
      (s, dir) => {
        val scratch = sentinelEventsDir(s, dir, 120 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val agg = EventStreams.hourlyStats(stream)
        runToTable(s, agg, "append")
          .filter(col("event_type") =!= "sentinel")
          .select(unix_timestamp(col("hour_start")).as("hour_epoch_s"),
            col("event_type"), col("n"),
            round(col("sum_value"), 2).as("sum_value"))
          .orderBy(col("hour_epoch_s"), col("event_type"))
      },
      Some("""
        |SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) * 3600 AS hour_epoch_s,
        |       event_type,
        |       count(*)             AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_epoch_s, event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming ingestion dedup: the SAME source read twice and unioned
      // (every event arrives exactly twice, the retry/replay shape), then
      // dropDuplicatesWithinWatermark on event_id. The append-mode sink
      // holds each event once; aggregating it must equal plain batch
      // aggregation of the un-duplicated table.
      "st02_stream_dedup",
      (s, dir) => {
        val doubled = eventStream(s, dir).unionByName(eventStream(s, dir))
        val deduped = EventStreams.dedupStream(doubled, "1 hour", Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        runToTable(s, deduped, "append")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""
        |SELECT event_type, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users,
        |       round(sum(value), 2)    AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming sessionization (q14's streaming twin): session_window
      // with a 30-minute gap over the watermarked event stream, run in
      // APPEND mode — the sink receives exactly the CLOSED sessions. A
      // sentinel event planted gap+lateness+1min past the real maximum
      // advances the final watermark beyond every real session's end, so
      // append emission is total and the batch oracle must match exactly.
      // (session_window merges windows that OVERLAP, so an event exactly
      // gap after its predecessor starts a NEW session: the batch
      // convention is diff >= gap. The testdata has no exact-gap ties, so
      // this matches q14's strict-> convention too.)
      "st03_stream_sessions",
      (s, dir) => {
        val scratch = sentinelEventsDir(s, dir, 41 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val sessions = runToTable(s,
          EventStreams.sessionStats(stream, "30 minutes", "10 minutes"),
          "append")
        sessions.filter(col("user_id") >= 0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("total_events"))
          .groupBy(col("n_sessions"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("total_events")).as("total_events"))
          .orderBy(col("n_sessions"))
      },
      Some("""
        |WITH marked AS (
        |  SELECT user_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |),
        |per_user AS (
        |  SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |         count(*) AS total_events
        |  FROM marked GROUP BY user_id
        |)
        |SELECT n_sessions, count(*) AS n_users,
        |       CAST(sum(total_events) AS BIGINT) AS total_events
        |FROM per_user
        |GROUP BY n_sessions
        |ORDER BY n_sessions
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming -> lake sink: the purchase stream lands as day-partitioned
      // parquet via foreachBatch (EventStreams.sinkToParquet — the
      // continuous-ingestion layout batch jobs read back), then the landed
      // files are read and aggregated. Stateless passthrough, so append
      // emission is total without watermark games; checkpoint + output dirs
      // are wiped per run because the sink appends by contract.
      "st04_stream_sink",
      (s, dir) => {
        val base = s"${Scratch.ioRoot(s)}/st04_${sanitize(dir)}"
        val out = s"$base/data"; val ckpt = s"$base/checkpoint"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val purchases = eventStream(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"),
            expr("ts div 86400000000000").as("day"))
        val q = EventStreams.sinkToParquet(purchases, out, ckpt,
          Seq("day"), Trigger.AvailableNow())
        q.awaitTermination()
        // Partition-dir values are type-inferred (int at these magnitudes);
        // cast back to the source's long so schemas match the oracle.
        s.read.parquet(out)
          .withColumn("day", col("day").cast("long"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("day"))
      },
      Some("""
        |SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
        |       count(*)                AS n,
        |       count(DISTINCT user_id) AS n_users,
        |       round(sum(value), 2)    AS sum_value
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY day
        |""".stripMargin.trim)),

    QueryDef(
      // Stream-stream interval join: each purchase attributed to the same
      // user's signup within the preceding 7 days, BOTH sides unbounded
      // streams (EventStreams.purchaseAttribution). The two watermarks
      // bound the join state the engine must hold — the property that
      // keeps this runnable forever — while inner-join matches emit as
      // they are found, so no sentinel is needed for total emission.
      "st05_stream_attribution",
      (s, dir) => {
        val ev = eventStream(s, dir)
        val joined = EventStreams.purchaseAttribution(ev, "7 days")
          .select(col("purchase_id"), col("user_id"), col("value"),
            unix_timestamp(col("purchase_time")).as("p_epoch_s"),
            unix_timestamp(col("signup_time")).as("s_epoch_s"))
        // Join state ~ the filtered events themselves (both sides keyed,
        // 7-day retention spans the whole fixture), so provision state
        // partitions to input volume: the gate/bench fixtures stay at the
        // 8-partition floor (band unchanged), sf10's 10M events size up
        // to the cap. The total row count is a metadata read — a fine
        // upper bound for provisioning.
        runToTable(s, joined, "append",
          EventStreams.statePartitionsFor(Tables(s, dir).events.count()))
          .groupBy()
          .agg(count(lit(1)).as("n_attributed"),
            countDistinct(col("purchase_id")).as("n_purchases"),
            countDistinct(col("user_id")).as("n_users"),
            round(sum(col("value")), 2).as("sum_value"),
            round(avg(col("p_epoch_s") - col("s_epoch_s")), 4)
              .as("avg_lag_s"))
      },
      Some("""
        |WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, value,
        |         epoch_us(ts) // 1000000 AS p_epoch_s,
        |         epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |),
        |s AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS s_epoch_s,
        |         epoch_us(ts) AS s_us
        |  FROM events WHERE event_type = 'signup'
        |)
        |SELECT count(*)                          AS n_attributed,
        |       count(DISTINCT purchase_id)       AS n_purchases,
        |       count(DISTINCT p.user_id)         AS n_users,
        |       round(sum(value), 2)              AS sum_value,
        |       round(avg(p_epoch_s - s_epoch_s), 4) AS avg_lag_s
        |FROM p JOIN s ON p.user_id = s.user_id
        |  AND s.s_us <= p.p_us
        |  AND s.s_us >= p.p_us - CAST(7 AS BIGINT) * 86400 * 1000000
        |""".stripMargin.trim)),

    QueryDef(
      // Sliding-window rates (EventStreams.slidingStats): overlapping
      // 1-hour windows advancing every 15 minutes — each event lands in 4
      // windows (Spark's Expand), then partial+final aggregation; the
      // watermark closes windows as it passes their end, so append-mode
      // state stays bounded on an unbounded stream. Same sentinel trick
      // as st01 makes emission total at the gate; the oracle enumerates
      // each event's 4 containing windows explicitly.
      "st06_stream_sliding",
      (s, dir) => {
        val scratch = sentinelEventsDir(s, dir, 120 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val agg = EventStreams.slidingStats(stream)
        runToTable(s, agg, "append")
          .filter(col("event_type") =!= "sentinel")
          .select(unix_timestamp(col("window_start")).as("w_epoch_s"),
            col("event_type"), col("n"),
            round(col("sum_value"), 2).as("sum_value"))
          .orderBy(col("w_epoch_s"), col("event_type"))
      },
      Some("""
        |WITH e AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS es, event_type, value
        |  FROM events
        |),
        |w AS (
        |  SELECT (es // 900) * 900 - k * 900 AS w_start, event_type, value
        |  FROM e, range(4) t(k)
        |)
        |SELECT CAST(w_start AS BIGINT) AS w_epoch_s, event_type,
        |       count(*)             AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM w
        |GROUP BY 1, 2
        |ORDER BY w_epoch_s, event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Custom keyed state (EventStreams.runningUserTotals,
      // mapGroupsWithState): per-user running totals held in the state
      // store, emitted each trigger in update mode. One AvailableNow
      // batch -> exactly one output row per user carrying the final
      // totals, which must equal the batch aggregation. The double sum
      // folds in arrival order, so the output rounds it; counts are
      // order-free. State shards by user key across executors — the
      // continuously-updated-aggregate shape for per-entity logic that
      // outgrows built-in aggregates.
      "st07_stream_totals",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .select(col("user_id"), col("event_type"), col("value"))
          .as[EventStreams.UserEvent]
        val totals = EventStreams.runningUserTotals(ev).toDF()
        runToTable(s, totals, "update")
          .select(col("user_id"), col("n_events"),
            round(col("total_value"), 2).as("total_value"),
            col("n_purchases"))
          .orderBy(col("user_id"))
      },
      Some("""
        |SELECT user_id,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS total_value,
        |       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |            AS BIGINT) AS n_purchases
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming CDC apply: the purchase stream is a change feed to a
      // keyed lake table (latest purchase per user), written as a 4-file
      // feed and processed ONE FILE PER TRIGGER — four real micro-batches,
      // each running Lake.cdcUpsert (keyed full-outer MERGE join) against
      // the table and atomically swapping the parquet dir. cdcUpsert's
      // last-write-wins ordering on (ts_us, event_id) is associative, so
      // the final table is independent of which file lands in which batch
      // — the property that makes a distributed change feed deterministic.
      // Ordering uses microsecond time on both engines (ns -> us) because
      // the DuckDB oracle only sees us-truncated timestamps.
      "st08_stream_cdc",
      (s, dir) => {
        val base = s"${Scratch.ioRoot(s)}/st08_${sanitize(dir)}"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val t = Tables(s, dir)
        val feedDir = s"$base/feed"; val tableDir = s"$base/table"
        t.events.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"),
            expr("ts div 1000").as("ts_us"))
          .repartition(4, pmod(col("event_id"), lit(4)))
          .write.mode("overwrite").parquet(feedDir)
        val feedSchema = s.read.parquet(feedDir).schema
        val stream = s.readStream.schema(feedSchema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val q = stream.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            val tablePath = new org.apache.hadoop.fs.Path(tableDir)
            val cur = if (fs.exists(tablePath)) s.read.parquet(tableDir)
              else batch.limit(0)
            val merged = graft.ops.Lake.cdcUpsert(cur, batch.toDF(),
              "user_id", Seq("ts_us", "event_id"))
            val tmp = s"$base/table_tmp"
            merged.write.mode("overwrite").parquet(tmp)
            fs.delete(tablePath, true)
            fs.rename(new org.apache.hadoop.fs.Path(tmp), tablePath)
            ()
          }.start()
        q.awaitTermination()
        s.read.parquet(tableDir).agg(
          count(lit(1)).as("n_users"),
          round(sum(col("value")), 2).as("sum_latest"),
          max(col("ts_us")).as("max_ts_us"))
      },
      Some("""
        |WITH ranked AS (
        |  SELECT user_id, value, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT count(*) AS n_users,
        |       round(sum(value), 2) AS sum_latest,
        |       max(ts_us) AS max_ts_us
        |FROM ranked WHERE rn = 1
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming NEAR-dup dedup over a document stream: each arriving
      // doc's MinHash(8) signature over char 5-gram shingles is the
      // dedup key — signature-identical docs (near-dups, not just exact
      // dups) collapse to their first arrival, the streaming half of
      // d02's batch LSH pass and the ingest-time guard a training
      // pipeline runs before anything lands in the lake. State is
      // watermark-bounded (dropDuplicatesWithinWatermark; synthetic
      // event times span < the 1 h delay, so the gate dedup is total).
      // WHICH doc survives a signature group is arrival-order dependent,
      // so the checked output is the order-invariant reduction: the
      // count of distinct signatures. The scale note from Dedup applies:
      // this per-row signature form pays k md5 sweeps per doc; a 100 TB
      // ingest amortizes via the explode + partial-min shape instead.
      "st09_stream_neardup",
      (s, dir) => {
        val docsSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream.schema(docsSchema)
          .option("basePath", dir).parquet(s"$dir/documents*.parquet")
          // File-stream sources parallelize per FILE (no row-group
          // splitting): a single-file fixture would run the expensive
          // shingle+minhash map on ONE task (measured 31 s at sf0.1).
          // An explicit round-robin exchange spreads the micro-batch
          // before the per-row work — the signature map must never
          // depend on source parallelism. (A real deployment's stream
          // arrives in many files/partitions, but the knob still
          // belongs to the operator, not the source layout.)
          .repartition(Runtime.getRuntime.availableProcessors())
        val sig = stream.filter(length(col("text")) >= 5)
          .withColumn("event_time",
            timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(600L))))
          // Fused one-pass signature expression (same Carter-Wegman math
          // as Dedup.minhashSignature, which inlines k md5 sweeps of the
          // shingle array per row — the k-branch HOF form this expression
          // exists to replace; swap measured 6.7-11.6 -> 1.7 s for st09).
          .withColumn("pairs",
            graft.functions.CharGramPairs48(col("text"), 5))
          .withColumn("sig", concat_ws(",", transform(
            graft.functions.MinhashSignature(col("pairs"), 8),
            v => v.cast("string"))))
        val uniq = EventStreams.dedupStream(sig, "1 hour", Seq("sig"))
        runToTable(s, uniq.select(col("sig")), "append")
          .agg(count(lit(1)).as("n_unique"))
      },
      Some("""
        |WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(length(text) - 4),
        |           i -> substr(text, i + 1, 5))) AS grams
        |  FROM documents WHERE length(text) >= 5
        |),
        |ex AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(g), 1, 12)) AS BIGINT)  AS h1,
        |         CAST(concat('0x', substr(md5(g), 13, 12)) AS BIGINT) AS h2
        |  FROM (SELECT doc_id, unnest(grams) AS g FROM sh)
        |),
        |hashed AS (
        |  SELECT doc_id, j, min((h1 + j * h2) % 2147483647) AS sigv
        |  FROM ex, range(8) t(j)
        |  GROUP BY doc_id, j
        |),
        |sigs AS (
        |  SELECT doc_id, array_to_string(list(sigv ORDER BY j), ',') AS sig
        |  FROM hashed GROUP BY doc_id
        |)
        |SELECT count(DISTINCT sig) AS n_unique FROM sigs
        |""".stripMargin.trim)),

    QueryDef(
      // Stream-STATIC enrichment join — the one join mode the family
      // lacked (st05 is stream-stream): arriving events join a broadcast
      // dimension (customer -> market segment) with NO join state at all,
      // then feed a watermarked hourly window per segment in append mode.
      // This is the 100 TB enrichment shape: the static side is a plain
      // batch relation re-broadcast per micro-batch (a lake-backed dim
      // picks up slowly-changing updates for free), the stream side
      // keeps only the windowed-agg state. The sentinel (user_id -1)
      // never matches the dimension — the inner join drops the row, but
      // the watermark operator sits BEFORE the join, so the sentinel
      // still closes the final real windows and emission is total.
      "st10_stream_enrich",
      (s, dir) => {
        val scratch = sentinelEventsDir(s, dir, 120 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val dim = broadcast(Tables(s, dir).customer
          .select(col("c_custkey"), col("c_mktsegment")))
        val agg = stream
          .withWatermark("event_time", "10 minutes")
          .join(dim, col("user_id") === col("c_custkey"))
          .groupBy(window(col("event_time"), "1 hour"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
        runToTable(s, agg, "append")
          .select(unix_timestamp(col("window.start")).as("hour_epoch_s"),
            col("c_mktsegment"), col("n"), round(col("sv"), 2).as("sum_value"))
          .orderBy(col("hour_epoch_s"), col("c_mktsegment"))
      },
      Some("""
        |SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) * 3600
        |         AS hour_epoch_s,
        |       c_mktsegment,
        |       count(*)             AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2
        |""".stripMargin.trim)),

    QueryDef(
      // Stream-stream LEFT OUTER interval join — st05's inner join
      // silently drops exactly the rows a funnel-health monitor needs:
      // purchases with NO qualifying signup in the preceding 7 days.
      // Outer-result emission is watermark-driven (a null-signup row may
      // only emit once no matching signup can still arrive), so the
      // sentinel advances the final watermark 8 days past the true max —
      // beyond every purchase's match window + lateness — making outer
      // emission total at the gate; a real unbounded stream's advancing
      // watermark does this continuously. The sentinel rides BOTH filter
      // legs (it must advance both input watermarks), matches only
      // itself, and is dropped by the user filter after the sink.
      "st11_stream_attrib_gaps",
      (s, dir) => {
        val scratch = sentinelEventsDir(s, dir, 8L * 24 * 60 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val joined = EventStreams.attributionJoin(
          stream.filter(col("event_type").isin("purchase", "sentinel")),
          stream.filter(col("event_type").isin("signup", "sentinel")),
          window = "7 days", joinType = "left_outer")
        // Same provisioning law as st05: outer-join state holds both
        // filtered sides for the full 7-day window.
        runToTable(s, joined, "append",
          EventStreams.statePartitionsFor(Tables(s, dir).events.count()))
          .filter(col("user_id") =!= -1L)
          .agg(count(lit(1)).as("n_rows"),
            count(col("signup_time")).as("n_matched"),
            countDistinct(when(col("signup_time").isNull,
              col("purchase_id"))).as("n_gap_purchases"),
            round(sum(when(col("signup_time").isNull, col("value"))), 2)
              .as("gap_value"))
      },
      Some("""
        |WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, value, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |),
        |s AS (
        |  SELECT user_id AS s_user_id, epoch_us(ts) AS s_us
        |  FROM events WHERE event_type = 'signup'
        |),
        |j AS (
        |  SELECT p.purchase_id, p.value, s.s_us
        |  FROM p LEFT JOIN s ON p.user_id = s.s_user_id
        |    AND s.s_us <= p.p_us
        |    AND s.s_us >= p.p_us - CAST(7 AS BIGINT) * 86400 * 1000000
        |)
        |SELECT count(*) AS n_rows,
        |       count(s_us) AS n_matched,
        |       count(DISTINCT CASE WHEN s_us IS NULL THEN purchase_id END)
        |         AS n_gap_purchases,
        |       round(sum(CASE WHEN s_us IS NULL THEN value END), 2)
        |         AS gap_value
        |FROM j
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming ingest quality gate: the fused CharEntropy scalar (t25)
      // and a length floor run INSIDE the stream — stateless map-only
      // micro-batches in append mode, no watermark, no state store: the
      // shape of a filter-at-ingest deployment where quality scoring must
      // not add a shuffle to the hot path. The batch-equivalence contract
      // (same per-source keep counts and mean entropy as the static
      // table) is exactly what AvailableNow + append guarantees for a
      // stateless transform.
      "st12_stream_quality",
      (s, dir) => {
        val docsSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream.schema(docsSchema)
          .option("basePath", dir).parquet(s"$dir/documents*.parquet")
        val scored = stream
          .withColumn("h",
            round(graft.functions.CharEntropy(col("text")), 4))
          .filter(col("h") >= 2.0 && length(col("text")) >= 20)
        runToTable(s, scored.select(col("doc_id"), col("source"), col("h")),
            "append")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("h")), 4).as("mean_entropy"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |  FROM documents
        |),
        |freq AS (
        |  SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
        |),
        |freq2 AS (
        |  SELECT doc_id, k, sum(k) OVER (PARTITION BY doc_id) AS n
        |  FROM freq
        |),
        |ent AS (
        |  SELECT doc_id, -sum((k * 1.0 / n) * ln(k * 1.0 / n)) AS h
        |  FROM freq2 GROUP BY doc_id
        |),
        |kept AS (
        |  SELECT d.source, round(e.h, 4) AS h
        |  FROM documents d JOIN ent e USING (doc_id)
        |  WHERE round(e.h, 4) >= 2.0 AND length(d.text) >= 20
        |)
        |SELECT source, count(*) AS n_kept, round(avg(h), 4) AS mean_entropy
        |FROM kept
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Spark 4 arbitrary-state API (EventStreams.userPeaks,
      // transformWithState + StatefulProcessor + typed ValueState): per-
      // user high-water-mark audit — running count, max value, and the
      // ORDER-DEPENDENT count of record-breaking events, per-entity
      // logic beyond any built-in aggregate. One AvailableNow batch ->
      // one update-mode row per user (st07's contract shape); the oracle
      // replays record detection with a preceding-rows window max in the
      // same total (ts_us, event_id) order. Requires RocksDB state store
      // (TWS multi-column-family layout), which runToTable provisions.
      "st13_stream_peaks",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("value"))
          .as[EventStreams.PeakEvent]
        val peaks = EventStreams.userPeaks(ev).toDF()
        runToTable(s, peaks, "update")
          .select(col("user_id"), col("n_events"),
            round(col("max_value"), 2).as("max_value"), col("n_records"))
          .orderBy(col("user_id"))
      },
      Some("""
        |WITH e AS (
        |  SELECT user_id, value, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |),
        |pm AS (
        |  SELECT user_id, value,
        |         max(value) OVER (PARTITION BY user_id
        |                          ORDER BY ts_us, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS prior_max
        |  FROM e
        |)
        |SELECT user_id, count(*) AS n_events,
        |       round(max(value), 2) AS max_value,
        |       CAST(count(CASE WHEN prior_max IS NULL OR value > prior_max
        |                       THEN 1 END) AS BIGINT) AS n_records
        |FROM pm
        |GROUP BY user_id
        |ORDER BY user_id
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming cardinality: per-type distinct users tracked as an HLL
      // SKETCH in keyed state (EventStreams.streamingUniques) — KB of
      // state per key on an unbounded stream, where a per-key user set
      // would grow without bound. Sketch registers are order-independent
      // (estimates exact in coupon modes, within-RSE past HLL promotion
      // — pinned in StreamingSpec); here the driver-checkable contract
      // is a03's within-5% band against the exact batch distinct,
      // computed in the same query from the same parquet.
      "st14_stream_uniques",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .select(col("event_type"), col("user_id"))
          .as[EventStreams.TypedEvent]
        val est = EventStreams.streamingUniques(ev).toDF()
        val streamed = runToTable(s, est, "update")
        val exact = Tables(s, dir).events
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        exact.join(streamed, Seq("event_type"))
          .select(col("event_type"), col("n_exact"),
            (abs(col("est_uniques") - col("n_exact")) <=
              col("n_exact").cast("double") * 0.05).as("sketch_ok"))
          .orderBy(col("event_type"))
      },
      Some("""
        |SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS sketch_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming temporal (as-of) join — Flink's temporal-table join,
      // inexpressible with Spark's stream-stream interval joins: each
      // purchase enriched with the SAME user's latest signup at-or-before
      // its event time, via ONE keyed stream and a single-long ValueState
      // per user (EventStreams.streamAsOfEnrich). O(keys) state forever —
      // no watermark-bounded buffer of the dimension side — and the
      // output IS the batch backward as-of join, which the DuckDB ASOF
      // JOIN oracle replays directly (q15's semantics through streaming
      // state).
      "st15_stream_asof",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .filter(col("event_type").isin("signup", "purchase"))
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"))
          .as[EventStreams.EnrichEvent]
        val enriched = EventStreams.streamAsOfEnrich(ev).toDF()
        runToTable(s, enriched, "append")
          .select(col("event_id"), col("user_id"), col("purchase_us"),
            col("signup_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        |SELECT p.event_id, p.user_id,
        |       epoch_us(p.ts) AS purchase_us,
        |       epoch_us(s.ts) AS signup_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY p.event_id
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming heavy hitters: per-type top-3 users by event count with
      // a bounded SpaceSaving counter map in keyed state
      // (EventStreams.streamingTopK — the a04 batch aggregate's algorithm
      // and wire format in a state-store cell). O(capacity) state per key
      // on an unbounded stream. The EXACTNESS certification (oracle = the
      // plain batch count ranking; ties count desc then user asc, the
      // processor's own sort) requires capacity >= the per-type distinct
      // key count, so capacity is PROVISIONED from the key-domain
      // statistic — 2x distinct users, gate-floored at 4096 — the way a
      // production deployment sizes counter state from cardinality
      // estimates (gate: ~1500 users -> 4096 unchanged; the sf1 replay's
      // 150k users previously silently exceeded the fixed 4096 and the
      // estimates diverged from the exact oracle). Past the provisioned
      // capacity SpaceSaving degrades to its documented epsilon bound —
      // that is the sketch's 100 TB contract, certified exact here.
      "st16_stream_topk",
      (s, dir) => {
        import s.implicits._
        val distinctUsers =
          Tables(s, dir).events.agg(
            countDistinct(col("user_id"))).head.getLong(0)
        val cap = math.max(4096L, 2L * distinctUsers).toInt
        val ev = eventStream(s, dir)
          .select(col("event_type"), col("user_id"))
          .as[EventStreams.TypedEvent]
        val top = EventStreams.streamingTopK(ev, k = 3, capacity = cap).toDF()
        runToTable(s, top, "update")
          .select(col("event_type"), col("rnk"), col("user_id"),
            col("est_count"))
          .orderBy(col("event_type"), col("rnk"))
      },
      Some("""
        |WITH c AS (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT event_type, user_id, cnt,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY cnt DESC, user_id) AS rnk
        |  FROM c
        |)
        |SELECT event_type, CAST(rnk AS INTEGER) AS rnk, user_id,
        |       cnt AS est_count
        |FROM r WHERE rnk <= 3
        |ORDER BY event_type, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming quantiles: per-type running p50/p95 of the value column
      // as a KLL sketch in keyed state (EventStreams.streamingQuantiles)
      // — KB of state per key on an unbounded stream where the exact
      // answer needs every value. KLL guarantees RANK accuracy (~1.65%
      // at k=200) and its compaction is randomized, so the driver
      // contract checks the exact batch RANK of each streamed estimate
      // within a 3.5% band — the estimator-honesty rule st14 set for
      // HLL, applied to quantiles.
      "st17_stream_quantiles",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .select(col("event_type"), col("value"))
          .as[EventStreams.ValueEvent]
        val est = EventStreams.streamingQuantiles(ev).toDF()
        val streamed = runToTable(s, est, "update")
        Tables(s, dir).events
          .join(broadcast(streamed), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            (abs(sum(when(col("value") <= col("est_p50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1)) - 0.5) <= 0.035).as("p50_ok"),
            (abs(sum(when(col("value") <= col("est_p95"), 1L).otherwise(0L))
              .cast("double") / count(lit(1)) - 0.95) <= 0.035).as("p95_ok"))
          .orderBy(col("event_type"))
      },
      Some("""
        |SELECT event_type, count(*) AS n_events,
        |       TRUE AS p50_ok, TRUE AS p95_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming drift monitor: per-hour Population Stability Index of
      // the event-type distribution against the whole-history mixture —
      // the live "did the traffic shape change this window" alarm a
      // serving/ingest pipeline keeps on its dashboards. The streaming
      // piece is the watermarked hourly window count in APPEND mode
      // (st01's closed-window shape and sentinel — no new state type, so
      // no new restart spec); PSI folds over the CLOSED windows
      // batch-side, on an hours x types-bounded relation. Terms sum over
      // OBSERVED types only (t19's observed-support convention — a type
      // absent from an hour contributes 0, avoiding the ln(0) pole that
      // epsilon-smoothing would make engine-specific); counts are exact
      // integers, the single ln rounds at 4 (t19's libm rule).
      "st18_stream_drift",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scratch = sentinelEventsDir(s, dir, 120 * MinuteNs)
        val stream = EventStreams.withEventTime(
          s.readStream.schema(EventStreams.rawSchema).parquet(scratch))
        val counts = runToTable(s, EventStreams.hourlyStats(stream), "append")
          .filter(col("event_type") =!= "sentinel")
          .select(unix_timestamp(col("hour_start")).as("hour_epoch_s"),
            col("event_type"), col("n"))
        val j = counts
          .withColumn("nh",
            sum("n").over(Window.partitionBy("hour_epoch_s")).cast("double"))
          .withColumn("nt",
            sum("n").over(Window.partitionBy("event_type")).cast("double"))
          .withColumn("ntot",
            sum("n").over(Window.partitionBy()).cast("double"))
        j.groupBy(col("hour_epoch_s"))
          .agg(sum(col("n")).as("n_events"),
            round(sum((col("n") / col("nh") - col("nt") / col("ntot")) *
              log((col("n") / col("nh")) / (col("nt") / col("ntot")))), 4)
              .as("psi"))
          .orderBy(col("hour_epoch_s"))
      },
      Some("""
        |WITH c AS (
        |  SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) * 3600
        |           AS hour_epoch_s,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |j AS (
        |  SELECT hour_epoch_s, CAST(n AS DOUBLE) AS n,
        |         CAST(sum(n) OVER (PARTITION BY hour_epoch_s) AS DOUBLE) AS nh,
        |         CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS nt,
        |         CAST(sum(n) OVER () AS DOUBLE) AS ntot
        |  FROM c
        |)
        |SELECT hour_epoch_s, CAST(sum(n) AS BIGINT) AS n_events,
        |       round(sum((n / nh - nt / ntot) * ln((n / nh) / (nt / ntot))), 4)
        |         AS psi
        |FROM j GROUP BY hour_epoch_s ORDER BY hour_epoch_s
        |""".stripMargin.trim)),

    QueryDef(
      // Streaming per-user 3-sigma anomaly flagging — the live outlier
      // alarm over a metric stream. Keyed state is THREE exact longs
      // (n, Σv, Σv²) per user; the 3σ test is cross-multiplied into
      // exact integer arithmetic ((n·v−s)² > 9·(n·q−s²), int64 fast
      // path with a BigInt fallback once intermediates near 2⁶³), so
      // the stream's verdicts equal the batch window computation
      // bit-for-bit — the oracle replays it as ROWS UNBOUNDED
      // PRECEDING..1 PRECEDING window sums over the same milli-unit
      // integers, cross-multiplying in HUGEINT (DuckDB overflow-checks
      // loudly rather than wrapping, mirroring the engine's exactness).
      // Values scale to millis (not micros) so the int64 STATE moments
      // keep headroom at every SF (math in the EventStreams scaladoc).
      // Restart behavior is pinned in StreamingSpec on disjoint-ts
      // batches.
      "st19_stream_zscore",
      (s, dir) => {
        import s.implicits._
        val ev = eventStream(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"),
            round(col("value") * 1000).cast("long").as("v"))
          .as[EventStreams.ZEvent]
        val anomalies = EventStreams.streamingZScores(ev, minPrior = 10)
        runToTable(s, anomalies.toDF(), "append")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            round(col("v") / 1000.0, 3).as("value"), col("n_prior"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id,
        |         CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events
        |),
        |w AS (
        |  SELECT user_id, ts_us, event_id, v,
        |         count(*) OVER win AS n_prior,
        |         sum(v)   OVER win AS s_prior,
        |         sum(v*v) OVER win AS q_prior
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, ts_us, event_id,
        |       round(v / 1000.0, 3) AS value, n_prior
        |FROM w
        |WHERE n_prior >= 10
        |  AND (CAST(n_prior AS HUGEINT)*v - s_prior)
        |      * (CAST(n_prior AS HUGEINT)*v - s_prior)
        |      > 9 * (CAST(n_prior AS HUGEINT)*q_prior
        |             - CAST(s_prior AS HUGEINT)*s_prior)
        |ORDER BY user_id, ts_us, event_id
        |""".stripMargin.trim))
  )
}
