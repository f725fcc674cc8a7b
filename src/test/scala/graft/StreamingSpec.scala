package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserTotals}

/** Streaming operators driven through MemoryStream with the batch plans as
  * oracle: the same transform over the same rows must agree.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("hourlyStats streaming output matches the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(5), "click", 1.0), (ts(15), "click", 2.0), (ts(25), "view", 3.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val in = stream.toDF.toDF("event_time", "event_type", "value")
    val q = EventStreams.hourlyStats(in).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("hourly_out")
      .select("event_type", "n", "sum_value").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = EventStreams.hourlyStats(
        rows.toDF("event_time", "event_type", "value"))
      .select("event_type", "n", "sum_value").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed === batch)
    assert(streamed === Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("sessionStats closes sessions on the inactivity gap") {
    val rows = Seq(
      (ts(0), 1L, 1.0), (ts(10), 1L, 1.0),   // session 1 (gap 10 < 30)
      (ts(50), 1L, 1.0),                      // session 2 (gap 40 > 30)
      (ts(0), 2L, 5.0))                       // other user
    val out = EventStreams.sessionStats(
        rows.toDF("event_time", "user_id", "value"))
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out === Seq((1L, 2L, 2.0), (1L, 1L, 1.0), (2L, 1L, 5.0)))
  }

  test("runningUserTotals accumulates keyed state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(stream.toDS()).writeStream
      .format("memory").queryName("totals_out").outputMode("update").start()

    stream.addData(UserEvent(1, "click", 1.0), UserEvent(1, "purchase", 9.0))
    q.processAllAvailable()
    stream.addData(UserEvent(1, "purchase", 5.0), UserEvent(2, "view", 2.0))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("totals_out").as[UserTotals].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
    assert(last(1L) === UserTotals(1L, 3L, 15.0, 2L))
    assert(last(2L) === UserTotals(2L, 1L, 2.0, 0L))
  }

  test("closedSessions emits in-batch gap closures and watermark timeouts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{ClosedSession, SessionEvent}
    val stream = MemoryStream[SessionEvent]
    val q = EventStreams.closedSessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("closed_out")
      .outputMode("append").start()

    // Session A (10:00-10:10, 2 events) closes in-batch: the 12:00 event
    // opens session B after a >30min gap.
    stream.addData(
      SessionEvent(1, ts(0), 1.0), SessionEvent(1, ts(10), 2.0),
      SessionEvent(1, Timestamp.valueOf("2024-01-01 12:00:00"), 5.0))
    q.processAllAvailable()
    // Advance the watermark far past B's timeout via another user.
    stream.addData(SessionEvent(2, Timestamp.valueOf("2024-01-01 15:00:00"), 9.0))
    q.processAllAvailable()
    stream.addData(SessionEvent(2, Timestamp.valueOf("2024-01-01 18:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("closed_out").as[ClosedSession].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start_us)
    assert(out.length === 2)
    assert(out(0).n_events === 2L && out(0).sum_value === 3.0) // session A
    assert(out(1).n_events === 1L && out(1).sum_value === 5.0) // session B timed out
  }

  test("dedupStream drops in-watermark duplicates, keeps distinct events") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String, Double)]
    val in = stream.toDF.toDF("event_time", "event_id", "event_type", "value")
    val q = EventStreams.dedupStream(in, "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // event 1 re-sent twice within the lateness window, event 2 once.
    stream.addData((ts(0), 1L, "click", 1.0), (ts(1), 1L, "click", 1.0),
      (ts(2), 2L, "view", 2.0), (ts(3), 1L, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 2L))
  }

  test("slidingStats overlapping windows count each event width/slide times") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((ts(5), "click", 1.0), (ts(35), "click", 2.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val in = stream.toDF.toDF("event_time", "event_type", "value")
    val q = EventStreams.slidingStats(in, width = "30 minutes", slide = "15 minutes")
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sliding_out")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSeq
    val batch = EventStreams.slidingStats(
        rows.toDF("event_time", "event_type", "value"),
        width = "30 minutes", slide = "15 minutes")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed === batch)
    // 30m/15m windows: each event appears in exactly 2 windows.
    assert(streamed.map(_._2).sum === rows.length * 2L)
  }

  test("enrichWithDimension joins the stream to a static broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "interaction"), ("view", "impression"))
      .toDF("dim_type", "category")
    val stream = MemoryStream[(Timestamp, String, Double)]
    val in = stream.toDF.toDF("event_time", "event_type", "value")
    val q = EventStreams.enrichWithDimension(in, dim, "event_type", "dim_type")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    stream.addData((ts(0), "click", 1.0), (ts(1), "scroll", 2.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
      .select("event_type", "category").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map("click" -> Some("interaction"), "scroll" -> None))
  }

  test("foreachBatch parquet sink lands append-mode results in the lake layout") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink")
    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.hourlyStats(
      stream.toDF.toDF("event_time", "event_type", "value"),
      lateness = "0 seconds")
    val q = EventStreams.sinkToParquet(agg, s"$dir/out", s"$dir/ckpt",
      partitionCols = Seq("event_type"))
    stream.addData((ts(5), "click", 1.0), (ts(15), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark past the 10:00 window so it closes and emits
    stream.addData((Timestamp.valueOf("2024-01-01 12:30:00"), "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.filter($"event_type" === "click")
      .agg(sum($"n")).collect().head.getLong(0) === 2L)
    // lake layout: partitioned directories by event_type
    assert(new java.io.File(s"$dir/out/event_type=click").exists())
  }

  test("left-outer attributionJoin emits gap rows only after the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, Long, Timestamp, Double)]
    val sStream = MemoryStream[(Long, Timestamp)]
    val joined = EventStreams.attributionJoin(
      pStream.toDF.toDF("event_id", "user_id", "event_time", "value"),
      sStream.toDF.toDF("user_id", "event_time"),
      window = "7 days", lateness = "0 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("attrib_gaps_out")
      .outputMode("append").start()
    try {
      // Batch 1: user 2 signs up then purchases (match); user 1 only
      // purchases. The match emits; the GAP row must NOT — a signup for
      // user 1 could still arrive within the watermark.
      sStream.addData((2L, ts(0)))
      pStream.addData((100L, 2L, ts(5), 9.0), (101L, 1L, ts(10), 5.0))
      q.processAllAvailable()
      val t1 = spark.table("attrib_gaps_out").collect()
      assert(t1.exists(_.getLong(0) == 100L), "inner match emits immediately")
      assert(!t1.exists(_.getLong(0) == 101L),
        "gap row must wait for the watermark")
      // Batches 2-3: advance BOTH watermarks far past user 1's match
      // window (watermark is computed from the PREVIOUS batch's max event
      // time, so outer emission needs one more batch after the advance).
      val far = Timestamp.valueOf("2024-01-20 10:00:00")
      val far2 = Timestamp.valueOf("2024-01-21 10:00:00")
      pStream.addData((900L, 99L, far, 0.0)); sStream.addData((99L, far))
      q.processAllAvailable()
      pStream.addData((901L, 99L, far2, 0.0)); sStream.addData((99L, far2))
      q.processAllAvailable()
      val t2 = spark.table("attrib_gaps_out").collect()
      val gap = t2.filter(_.getLong(0) == 101L)
      assert(gap.length === 1, "exactly one gap row for the unmatched purchase")
      assert(gap.head.isNullAt(3), "gap row carries a null signup_time")
    } finally q.stop()
  }

  test("file-stream form reads the events table incrementally") {
    // Copy the parquet into a dir the stream can list (single file).
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val in = EventStreams.readEventStream(spark, dir.toString)
    val q = EventStreams.hourlyStats(in).writeStream
      .format("memory").queryName("file_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("file_out").agg(sum("n")).collect().head.getLong(0)
    assert(n === 1000L) // all sf0.001 events flowed through the stream
  }

  test("streaming dedup state survives a checkpointed restart (exactly-once sink)") {
    // Two separate query RUNS over one checkpoint: run 1 drains file one
    // and stops; file two arrives (carrying a duplicate key); run 2
    // resumes from the checkpoint. The duplicate spans the restart
    // boundary, so exactly-once output REQUIRES the dedup state to come
    // back from the checkpoint — the recovery contract a production
    // ingest pipeline leans on.
    val base = s"/root/repo/target/graft-io/restart_${System.nanoTime()}"
    val feed = s"$base/feed"; val sink = s"$base/sink"; val chk = s"$base/chk"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val batch1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      batch1.coalesce(1).write.parquet(feed)
      def drain(): Unit = {
        val q = spark.readStream.schema(batch1.schema).parquet(feed)
          .dropDuplicates("k")
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", chk)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      Seq((2L, "B-DUPLICATE"), (3L, "c")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(feed)
      drain()
      val out = spark.read.parquet(sink).orderBy($"k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out === Seq((1L, "a"), (2L, "b"), (3L, "c")),
        "duplicate key crossing the restart must be dropped exactly once")
    } finally fs.delete(p, true)
  }

  test("userPeaks (transformWithState) holds typed state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{PeakEvent, PeakStats}
    val stream = MemoryStream[PeakEvent]
    // transformWithState requires the RocksDB provider (multi-column-
    // family state layout); scope it to this query.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStreams.userPeaks(stream.toDS()).toDF().writeStream
        .format("memory").queryName("peaks_out").outputMode("update").start()
      stream.addData(PeakEvent(1L, 1000L, 1L, 5.0),
        PeakEvent(1L, 2000L, 2L, 3.0), PeakEvent(2L, 1500L, 3L, 1.0))
      q.processAllAvailable()
      // Second batch: state from batch one must persist — user 1's 7.0
      // is a record against max 5.0, user 2's 0.5 is not.
      stream.addData(PeakEvent(1L, 3000L, 4L, 7.0),
        PeakEvent(2L, 2500L, 5L, 0.5))
      q.processAllAvailable(); q.stop()
      val out = spark.table("peaks_out").as[PeakStats].collect()
        .groupBy(_.user_id).map { case (_, rows) => rows.maxBy(_.n_events) }
        .toSeq.sortBy(_.user_id)
      assert(out === Seq(PeakStats(1L, 3L, 7.0, 2L), PeakStats(2L, 2L, 1.0, 1L)))
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamAsOfEnrich carries the latest dimension version across batches") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{EnrichEvent, EnrichedPurchase}
    val stream = MemoryStream[EnrichEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStreams.streamAsOfEnrich(stream.toDS()).toDF().writeStream
        .format("memory").queryName("asof_out").outputMode("append").start()
      // Batch 1: user 1 signs up at 100 and purchases at 150 and at 100
      // (equality matches); user 2 purchases with NO signup -> no emit.
      stream.addData(
        EnrichEvent(1L, 100L, 10L, "signup"),
        EnrichEvent(1L, 100L, 11L, "purchase"),
        EnrichEvent(1L, 150L, 12L, "purchase"),
        EnrichEvent(2L, 130L, 13L, "purchase"))
      q.processAllAvailable()
      // Batch 2: the signup state must SURVIVE the batch boundary (user
      // 1's purchase at 300 sees ts 100); a newer signup at 400 then
      // versions it for the purchase at 450; user 2 signs up and buys.
      stream.addData(
        EnrichEvent(1L, 300L, 20L, "purchase"),
        EnrichEvent(1L, 400L, 21L, "signup"),
        EnrichEvent(1L, 450L, 22L, "purchase"),
        EnrichEvent(2L, 500L, 23L, "signup"),
        EnrichEvent(2L, 600L, 24L, "purchase"))
      q.processAllAvailable(); q.stop()
      val out = spark.table("asof_out").as[EnrichedPurchase].collect()
        .sortBy(_.event_id)
        .map(e => (e.event_id, e.user_id, e.purchase_us, e.signup_us)).toSeq
      assert(out === Seq(
        (11L, 1L, 100L, 100L), (12L, 1L, 150L, 100L),
        (20L, 1L, 300L, 100L), (22L, 1L, 450L, 400L),
        (24L, 2L, 600L, 500L)))
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamingUniques sketch state survives a checkpointed restart") {
    import EventStreams.TypedEvent
    // Two query RUNS over one checkpoint (the dedup-restart pattern, but
    // for transformWithState): the sketch built in run 1 must come back
    // from RocksDB in run 2, or the final estimate undercounts.
    val base = s"/root/repo/target/graft-io/sketch_restart_${System.nanoTime()}"
    val feed = s"$base/feed"; val chk = s"$base/chk"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = (1L to 400L).map(u => TypedEvent("click", u))
      batch1.toDS().toDF().coalesce(1).write.parquet(feed)
      val sink = s"$base/sink"
      // The memory sink refuses checkpoint recovery; a foreachBatch
      // parquet landing supports it and appends each batch's running
      // estimates (the final one is the max — HIP estimates are
      // monotone in added items).
      def drain(): Unit = {
        val in = spark.readStream
          .schema(batch1.toDS().toDF().schema).parquet(feed)
          .as[TypedEvent]
        val q = EventStreams.streamingUniques(in).toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", chk)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      val batch2 = (201L to 700L).map(u => TypedEvent("click", u))
      batch2.toDS().toDF().coalesce(1).write.mode("append").parquet(feed)
      drain()
      val streamed = spark.read.parquet(sink)
        .collect().map(r => r.getLong(1)).max
      // 700 distinct users total; run 2 alone saw only 500 distinct —
      // an estimate near 700 (within ~3 sigma of the lgK-12 RSE) proves
      // the sketch state came back from the checkpoint. Exact equality
      // with a batch sketch is not asserted (estimator-path difference,
      // see the bit-for-bit test above).
      assert(math.abs(streamed - 700L) <= 35L,
        s"restarted estimate $streamed far from 700 — state not restored?")
      assert(streamed > 550L,
        s"estimate $streamed looks like run 2 alone — state lost")
    } finally {
      fs.delete(p, true)
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamingUniques estimates agree with the batch sketch within RSE") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{TypeCardinality, TypedEvent}
    val stream = MemoryStream[TypedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStreams.streamingUniques(stream.toDS()).toDF().writeStream
        .format("memory").queryName("uniques_out").outputMode("update").start()
      // Two batches with overlapping users: the sketch must survive the
      // batch boundary (user 1 and 2 re-seen in batch two add nothing).
      val batch1 = (1L to 600L).map(u => TypedEvent("click", u)) :+
        TypedEvent("view", 1L)
      val batch2 = (401L to 1000L).map(u => TypedEvent("click", u)) :+
        TypedEvent("view", 2L)
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("uniques_out").as[TypeCardinality].collect()
        .groupBy(_.event_type)
        .map { case (_, rows) => rows.maxBy(_.est_uniques) }
        .map(r => r.event_type -> r.est_uniques).toMap
      // Batch reference: Spark's own sketch aggregate over the SAME item
      // multiset and parameters (lgK 12 / HLL_8 / long updates). Exact
      // equality is NOT asserted for the large key: Spark's aggregate
      // MERGES per-partition sketches (composite estimator) while the
      // processor updates ONE sketch sequentially (HIP estimator), and
      // past the coupon->HLL promotion those paths differ by design —
      // both sit within the sketch's RSE (~1.6% at lgK 12).
      val batch = (batch1 ++ batch2).toDS()
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed("view") === 2L) // coupon-mode keys are EXACT counts
      assert(batch("view") === 2L)
      assert(math.abs(streamed("click") - 1000L) <= 50L, // ~3 sigma at lgK 12
        s"click estimate ${streamed("click")} far from 1000")
      assert(math.abs(streamed("click") - batch("click")) <= 30L,
        s"stream ${streamed("click")} vs batch ${batch("click")} diverged")
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamingQuantiles sketch state survives a checkpointed restart") {
    import EventStreams.ValueEvent
    // Disjoint value ranges per run make state loss visible: run 1 feeds
    // 0..999, run 2 feeds 1000..1999. The whole-history median is ~1000;
    // a run-2-only sketch would sit near 1500, far outside the KLL rank
    // band around the true median.
    val base = s"/root/repo/target/graft-io/kll_restart_${System.nanoTime()}"
    val feed = s"$base/feed"; val chk = s"$base/chk"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = (0 until 1000).map(i => ValueEvent("click", i.toDouble))
      batch1.toDS().toDF().coalesce(1).write.parquet(feed)
      val sink = s"$base/sink"
      def drain(): Unit = {
        val in = spark.readStream
          .schema(batch1.toDS().toDF().schema).parquet(feed)
          .as[ValueEvent]
        val q = EventStreams.streamingQuantiles(in).toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", chk)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      val batch2 = (1000 until 2000).map(i => ValueEvent("click", i.toDouble))
      batch2.toDS().toDF().coalesce(1).write.mode("append").parquet(feed)
      drain()
      val all = spark.read.parquet(sink)
      val last = all.agg(max($"batch_id")).head.getLong(0)
      val r = all.filter($"batch_id" === last).head()
      val (p50, p95) = (r.getDouble(1), r.getDouble(2))
      // 2000 values 0..1999: true p50 = ~1000, p95 = ~1900. KLL rank
      // error at k=200 is ~1.65% => ~±33 value units on this uniform
      // range; 70 gives ~2x margin for the randomized compaction.
      assert(math.abs(p50 - 1000.0) <= 70.0,
        s"restarted p50 $p50 far from 1000 — state not restored?")
      assert(math.abs(p95 - 1900.0) <= 70.0, s"p95 $p95 far from 1900")
    } finally {
      fs.delete(p, true)
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamingTopK counter state survives a checkpointed restart exactly") {
    import EventStreams.TypedEvent
    // Same two-run/one-checkpoint pattern as the sketch restart, but with
    // an EXACT contract: SpaceSaving at capacity >= distinct keys holds
    // true counts, so the final emission must equal the whole-history
    // ranking — run-1 counts included — or the counter map did not come
    // back from RocksDB.
    val base = s"/root/repo/target/graft-io/topk_restart_${System.nanoTime()}"
    val feed = s"$base/feed"; val chk = s"$base/chk"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = Seq.fill(5)(TypedEvent("click", 1L)) ++
        Seq.fill(3)(TypedEvent("click", 2L)) :+ TypedEvent("click", 3L)
      batch1.toDS().toDF().coalesce(1).write.parquet(feed)
      val sink = s"$base/sink"
      def drain(): Unit = {
        val in = spark.readStream
          .schema(batch1.toDS().toDF().schema).parquet(feed)
          .as[TypedEvent]
        val q = EventStreams.streamingTopK(in, k = 3, capacity = 64)
          .toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", chk)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      val batch2 = Seq.fill(4)(TypedEvent("click", 2L)) ++
        Seq.fill(2)(TypedEvent("click", 4L))
      batch2.toDS().toDF().coalesce(1).write.mode("append").parquet(feed)
      drain()
      val all = spark.read.parquet(sink)
      val last = all.agg(max($"batch_id")).head.getLong(0)
      val finalTop = all.filter($"batch_id" === last)
        .orderBy($"rnk")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      // Whole history: u1=5, u2=3+4=7, u3=1, u4=2 -> top-3 exact.
      assert(finalTop === Seq((1, 2L, 7L), (2, 1L, 5L), (3, 4L, 2L)),
        s"final ranking $finalTop != whole-history counts — state lost?")
    } finally {
      fs.delete(p, true)
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamingZScores moment state survives a checkpointed restart exactly") {
    import EventStreams.ZEvent
    // Two-run/one-checkpoint pattern with an EXACT contract: run 1 feeds
    // 12 identical values for one user (variance 0, n past minPrior);
    // run 2 feeds one extreme value then one more normal one. Flagging
    // the extreme event REQUIRES n_prior=12 from restored state (a cold
    // processor sees n_prior=0 < 10 and stays silent); the trailing
    // normal value must NOT flag (the spike inflates the variance), and
    // an equal-to-history value never flags at zero deviation. So the
    // expected output is exactly one anomaly row with n_prior == 12.
    val base = s"/root/repo/target/graft-io/zscore_restart_${System.nanoTime()}"
    val feed = s"$base/feed"; val chk = s"$base/chk"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = (1 to 12).map(i => ZEvent(7L, i.toLong, i.toLong, 1000L))
      batch1.toDS().toDF().coalesce(1).write.parquet(feed)
      val sink = s"$base/sink"
      def drain(): Unit = {
        val in = spark.readStream
          .schema(batch1.toDS().toDF().schema).parquet(feed)
          .as[ZEvent]
        val q = EventStreams.streamingZScores(in, minPrior = 10)
          .toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", chk)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      val batch2 = Seq(ZEvent(7L, 13L, 13L, 50000L), ZEvent(7L, 14L, 14L, 1000L))
      batch2.toDS().toDF().coalesce(1).write.mode("append").parquet(feed)
      drain()
      val out = spark.read.parquet(sink)
        .select($"user_id", $"ts_us", $"event_id", $"v", $"n_prior")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(out === Seq((7L, 13L, 13L, 50000L, 12L)),
        s"anomalies $out != the one planted spike at n_prior=12 — state lost?")
    } finally {
      fs.delete(p, true)
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("zScoreExceeds3Sigma is exact past the int64 cross-multiply range") {
    // BigInt reference for the mathematical predicate.
    def ref(n: Long, s: Long, q: Long, v: Long): Boolean = {
      val dev = BigInt(n) * v - s
      dev * dev > 9 * (BigInt(n) * q - BigInt(s) * s)
    }
    // The regime the old int64 formulation silently wrapped in (n·q and
    // s² past 2⁶³): 6000 prior events of constant v=560000 milli-units.
    // A zero-deviation event over zero variance must NOT flag; the
    // wrapped formulation computed 0 > (negative garbage) = true.
    val n = 6000L; val c = 560000L
    val sConst = n * c; val qConst = n * c * c
    assert(n * qConst < 0L, "test regime must actually wrap n*q in int64")
    assert(!EventStreams.zScoreExceeds3Sigma(n, sConst, qConst, c),
      "zero deviation over zero variance flagged — int64 wrap regression")
    // Same regime with real variance: half 559000 / half 561000 (σ=1000).
    // 4σ flags, 2σ does not — both sides of the boundary, both wrapped
    // before the fix.
    val sVar = 3000L * 559000L + 3000L * 561000L
    val qVar = 3000L * 559000L * 559000L + 3000L * 561000L * 561000L
    assert(EventStreams.zScoreExceeds3Sigma(n, sVar, qVar, c + 4000L))
    assert(!EventStreams.zScoreExceeds3Sigma(n, sVar, qVar, c + 2000L))
    // Fast/slow parity sweep: small states take the int64 fast path and
    // must agree with the BigInt reference everywhere, including exact
    // 3σ (strict inequality) and negative values.
    for {
      vals <- Seq(Seq(1L, 2L, 3L, 4L, 5L), Seq(-10L, 10L, -10L, 10L),
        Seq(1000L, 1000L, 1000L), Seq(0L, 0L, 7L))
      v <- Seq(-20L, -4L, 0L, 3L, 6L, 1000L, 4000L)
    } {
      val (nn, ss, qq) =
        (vals.size.toLong, vals.sum, vals.map(x => x * x).sum)
      assert(EventStreams.zScoreExceeds3Sigma(nn, ss, qq, v) ===
        ref(nn, ss, qq, v), s"parity broke at n=$nn s=$ss q=$qq v=$v")
    }
  }

  test("statePartitionsFor: floor at gate volumes, rows-bounded above, capped") {
    // Gate and bench fixtures (10k / 100k events) stay at the measured
    // 8-partition floor — fewer state-store instances IS the win there.
    assert(EventStreams.statePartitionsFor(0) === 8)
    assert(EventStreams.statePartitionsFor(10000) === 8)
    assert(EventStreams.statePartitionsFor(100000) === 8)
    // Past the floor, partitions track keyed volume (~125k rows each)...
    assert(EventStreams.statePartitionsFor(1000000) === 8)
    assert(EventStreams.statePartitionsFor(2000000) === 16)
    // ...until the instance-overhead cap (sf10's 10M events hit it).
    assert(EventStreams.statePartitionsFor(10000000) === 32)
    assert(EventStreams.statePartitionsFor(10000000, cap = 128) === 80)
    // A deployment with more executor cores raises the cap, not the law.
    assert(EventStreams.statePartitionsFor(100000000, cap = 1024) === 800)
  }
}
