package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-stream operators: the streaming counterparts of the batch event
  * queries (q13/q14). The reference has no streaming surface — everything
  * is request/response RPC (SURVEY.md §2.6) — so this module is pure
  * Spark-native extension: Structured Streaming with event-time watermarks,
  * tumbling-window aggregation, built-in session windows, and a custom
  * stateful operator via flatMapGroupsWithState.
  *
  * All transforms take a DataFrame with a proper `ts: timestamp` column and
  * work identically on `readStream` and batch `read` inputs — batch runs
  * are the correctness oracle for the streaming plans.
  */
object EventStreams {

  /** events.parquet schema with `ts` as epoch nanos (see Tables.events);
    * use [[withEventTime]] to get a timestamp column.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** [[rawSchema]] with `ts` as a native timestamp — the shape of events
    * files whose writer kept microsecond timestamp encoding rather than
    * epoch-nano int64 (file streams need a user-supplied schema, so the
    * source cannot infer this per-file).
    */
  val timestampSchema: StructType = StructType(rawSchema.map {
    case f if f.name == "ts" => f.copy(dataType = TimestampType)
    case f                   => f
  })

  /** The [[rawSchema]]/[[timestampSchema]] choice for the events files
    * under `path`, decided from one batch footer read (driver-side, no
    * scan). Streaming sources replay this schema for every file.
    */
  def eventsSchemaFor(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema("ts").dataType match {
      case LongType => rawSchema
      case _        => timestampSchema
    }

  /** Normalize `ts` to epoch-nano longs whichever of the two schemas the
    * source carried (exact: nothing exists below micros to lose).
    */
  def normalizeTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType => events
      case _ => events.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }

  /** Nanos -> microsecond-precision event-time timestamp column. */
  def withEventTime(events: DataFrame): DataFrame =
    normalizeTs(events).withColumn(
      "event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour window counts/sums per event type, tolerating
    * `lateness` of out-of-order data. Partial aggregation happens map-side;
    * the shuffle is keyed on (window, event_type).
    */
  def hourlyStats(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session aggregation with the built-in session_window: sessions close
    * after `gap` of inactivity per user. Watermark bounds state size — at
    * 100 TB/day this is what keeps the state store finite.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double,
      n_purchases: Long)

  /** Custom stateful operator: per-user running totals maintained in
    * keyed state, emitting the updated totals every trigger — the
    * mapGroupsWithState form of a continuously-updated aggregate.
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, 0L))
          val next = batch.foldLeft(prev) { (acc, e) =>
            acc.copy(
              n_events = acc.n_events + 1,
              total_value = acc.total_value + e.value,
              n_purchases = acc.n_purchases + (if (e.event_type == "purchase") 1 else 0))
          }
          state.update(next)
          next
      }
  }

  final case class SessionEvent(user_id: Long, event_time: java.sql.Timestamp,
      value: Double)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
      n_events: Long, sum_value: Double)

  /** Closed-session emitter via flatMapGroupsWithState with event-time
    * timeout: per-user state holds the one open session; gaps inside a
    * batch close sessions immediately, and the watermark passing
    * (last event + gap) times out and closes idle sessions. Append-mode
    * output contains exactly the CLOSED sessions — the custom-state
    * complement of the built-in `session_window` aggregation
    * ([[sessionStats]]), for when per-session logic outgrows an aggregate.
    */
  def closedSessions(events: Dataset[SessionEvent],
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("event_time", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession): ClosedSession =
            ClosedSession(userId, s.start_us, s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val sorted = batch.toSeq.sortBy(_.event_time.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              val ts = e.event_time.getTime * 1000L // ms -> us
              open match {
                case Some(s) if ts - s.last_us <= gapUs =>
                  open = Some(s.copy(last_us = ts, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += close(s)
                  open = Some(OpenSession(ts, ts, 1, e.value))
                case None =>
                  open = Some(OpenSession(ts, ts, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  final case class PeakEvent(user_id: Long, ts_us: Long, event_id: Long,
      value: Double)
  final case class PeakStats(user_id: Long, n_events: Long, max_value: Double,
      n_records: Long)

  /** Per-user high-water-mark tracker on Spark 4's arbitrary-state API
    * (`transformWithState` + [[PeakProcessor]]) — the successor of
    * mapGroupsWithState ([[runningUserTotals]]) with named TYPED state
    * variables in the store. "Record-breaking event" detection (an event
    * strictly above the user's prior maximum) is genuinely order-
    * dependent per-entity logic no built-in aggregate expresses; rows
    * fold in (ts_us, event_id) order within each batch, so the count is
    * a pure function of the data stream's order, not of micro-batch
    * boundaries (the st08 lesson) as long as batches arrive in time
    * order — which AvailableNow over an ordered feed guarantees.
    *
    * Requires the RocksDB state store provider (a transformWithState
    * constraint — the HDFS-backed store does not implement the
    * multi-column-family layout TWS state variables need).
    */
  def userPeaks(events: Dataset[PeakEvent]): Dataset[PeakStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new PeakProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** The [[userPeaks]] processor: one ValueState cell per user holding
    * (count, max, record-count), updated by folding each batch's rows in
    * (ts_us, event_id) order. Emits the running stats every trigger
    * (update mode); the first event is always a record (prior max is
    * -inf), matching the oracle's `prior_max IS NULL` branch.
    */
  final class PeakProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, PeakEvent, PeakStats] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[PeakStats] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[PeakStats]("peaks",
        org.apache.spark.sql.Encoders.product[PeakStats],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PeakEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[PeakStats] = {
      val prev = Option(state.get())
        .getOrElse(PeakStats(key, 0L, Double.NegativeInfinity, 0L))
      val next = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        .foldLeft(prev) { (acc, e) =>
          PeakStats(key,
            acc.n_events + 1,
            math.max(acc.max_value, e.value),
            acc.n_records + (if (e.value > acc.max_value) 1 else 0))
        }
      state.update(next)
      Iterator.single(next)
    }
  }

  final case class TypedEvent(event_type: String, user_id: Long)
  final case class TypeCardinality(event_type: String, est_uniques: Long)

  /** Streaming cardinality — per-key distinct-user estimates with an HLL
    * SKETCH as the keyed state (Apache DataSketches, the same library
    * behind Spark's `hll_sketch_agg`): a running "how many distinct users
    * per event type" over an unbounded stream costs KB of state per key
    * instead of a per-key set that grows with the user universe. Sketch
    * updates commute and are order-independent (state depends only on
    * the per-bucket maxima of the hashed item SET), so the registers are
    * a pure function of the items seen — micro-batch boundaries cannot
    * shift them. Estimates are EXACT while the sketch is in its coupon
    * modes (small keys); past HLL promotion the sequential (HIP) and
    * merged (composite) estimator paths differ within the sketch's RSE
    * (~1.6% at lgK 12), so agreement with the batch
    * `hll_sketch_agg(...)` is asserted within that band, not
    * bit-for-bit (StreamingSpec, incl. across a checkpointed restart).
    *
    * Requires RocksDB state store (transformWithState), like
    * [[userPeaks]].
    */
  def streamingUniques(events: Dataset[TypedEvent]): Dataset[TypeCardinality] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new SketchProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** The [[streamingUniques]] processor: one binary ValueState cell per
    * key holding the serialized updatable HLL sketch; each batch heapifies,
    * updates, re-serializes, and emits the running estimate (update mode).
    */
  final class SketchProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, TypedEvent, TypeCardinality] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("hll",
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeCardinality] = {
      import org.apache.datasketches.hll.{HllSketch, TgtHllType}
      val sketch = Option(state.get()) match {
        case Some(bytes) => HllSketch.heapify(bytes)
        case None => new HllSketch(12, TgtHllType.HLL_8)
      }
      rows.foreach(e => sketch.update(e.user_id))
      state.update(sketch.toUpdatableByteArray)
      Iterator.single(TypeCardinality(key, Math.round(sketch.getEstimate)))
    }
  }

  final case class TypeQuantiles(event_type: String, est_p50: Double,
      est_p95: Double)

  /** Streaming quantiles — per-key p50/p95 of the value column tracked as
    * a KLL floats sketch in keyed state (Apache DataSketches, the
    * mergeable-quantiles successor to GK): a running percentile over an
    * unbounded stream costs ~KB of state per key where an exact answer
    * needs every value. KLL's guarantee is on RANK, not value (~1.65%
    * normalized rank error at the default k=200, two-sided 99%), and its
    * compaction coin-flips make byte-level state run-dependent — so the
    * st17 contract checks the RANK of each estimate against the exact
    * batch distribution within a 3.5% band, never bit equality (the same
    * estimator-honesty rule as st14's HLL RSE band).
    *
    * Requires RocksDB state store (transformWithState), like
    * [[userPeaks]].
    */
  def streamingQuantiles(events: Dataset[ValueEvent]): Dataset[TypeQuantiles] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new QuantileProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class ValueEvent(event_type: String, value: Double)

  /** The [[streamingQuantiles]] processor: one binary ValueState cell per
    * key holding the serialized KLL sketch; each batch heapifies, updates,
    * re-serializes, and emits the running p50/p95.
    */
  final class QuantileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ValueEvent, TypeQuantiles] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("kll",
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ValueEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeQuantiles] = {
      import org.apache.datasketches.kll.KllFloatsSketch
      import org.apache.datasketches.memory.Memory
      val sketch = Option(state.get()) match {
        case Some(bytes) => KllFloatsSketch.heapify(Memory.wrap(bytes))
        case None => KllFloatsSketch.newHeapInstance()
      }
      rows.foreach(e => sketch.update(e.value.toFloat))
      state.update(sketch.toByteArray)
      Iterator.single(TypeQuantiles(key,
        sketch.getQuantile(0.5).toDouble, sketch.getQuantile(0.95).toDouble))
    }
  }

  final case class TypeTopUser(event_type: String, rnk: Int, user_id: Long,
      est_count: Long)

  /** Streaming heavy hitters — per-key top-`k` users by event count with a
    * bounded SpaceSaving counter map as the keyed state (the a04 batch
    * aggregate's algorithm, [[graft.functions.SpaceSaving]], running in a
    * state-store cell): O(capacity) state per key on an unbounded stream
    * where an exact per-user count map grows with the user universe.
    * Counts carry the classic SpaceSaving bound (over-estimate by at most
    * the smallest evicted counter); with `capacity` >= the key's distinct
    * users they are EXACT — the driver contract st16 runs under. Emission
    * sorts (-count, numeric user) so rank ties are deterministic and
    * engine-replayable.
    *
    * Requires RocksDB state store (transformWithState), like
    * [[userPeaks]].
    */
  def streamingTopK(events: Dataset[TypedEvent], k: Int,
      capacity: Int): Dataset[TypeTopUser] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k, capacity),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** The [[streamingTopK]] processor: one binary ValueState cell per key
    * holding the serialized counter map — the SAME wire format the batch
    * aggregate's partial buffers use, so restarts resume mid-stream
    * counts exactly.
    */
  final class TopKProcessor(k: Int, capacity: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, TypedEvent, TypeTopUser] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("ss",
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeTopUser] = {
      val sum = Option(state.get())
        .map(graft.functions.SpaceSaving.deserializeSummary)
        .getOrElse(graft.functions.SpaceSaving.emptySummary())
      rows.foreach(e => sum.offer(e.user_id.toString, 1L, capacity))
      state.update(graft.functions.SpaceSaving.serialize(sum.buf))
      sum.buf.toSeq.sortBy { case (u, c) => (-c, u.toLong) }.take(k)
        .zipWithIndex
        .map { case ((u, c), i) => TypeTopUser(key, i + 1, u.toLong, c) }
        .iterator
    }
  }

  final case class EnrichEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class EnrichedPurchase(event_id: Long, user_id: Long,
      purchase_us: Long, signup_us: Long)

  /** Streaming temporal (as-of) join — Flink's temporal-table join, which
    * Spark's stream-stream joins cannot express (they are interval
    * equi-joins, not "most recent version at event time"): each purchase
    * is enriched with the SAME user's latest signup at-or-before its
    * timestamp. Both event kinds ride ONE keyed stream; per user the
    * state is a single long (latest signup ts) — O(keys) state forever,
    * no watermark-bounded buffer of the dimension side. Rows fold in
    * (ts_us, kind, event_id) order with signups applied BEFORE equal-ts
    * purchases, so equality matches like the batch backward as-of
    * (q15's ASOF `s.ts <= p.ts`); with time-ordered batches (AvailableNow
    * over an ordered feed) the output is exactly the batch as-of join.
    * Purchases with no prior signup emit nothing, mirroring the batch
    * query's `isNotNull` filter.
    */
  def streamAsOfEnrich(events: Dataset[EnrichEvent]): Dataset[EnrichedPurchase] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new AsOfEnrichProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** The [[streamAsOfEnrich]] processor: one long ValueState per user —
    * the latest signup timestamp — updated and read in event-time order.
    */
  final class AsOfEnrichProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EnrichEvent, EnrichedPurchase] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Long]("latest_signup",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EnrichEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[EnrichedPurchase] = {
      // exists(), not a null check: absent primitive state unboxes to 0,
      // which is a valid timestamp.
      var latest = if (state.exists()) state.get() else Long.MinValue
      val out = Seq.newBuilder[EnrichedPurchase]
      // Signups sort before purchases at the same timestamp: backward
      // as-of includes equality.
      rows.toSeq
        .sortBy(e => (e.ts_us, if (e.event_type == "signup") 0 else 1,
          e.event_id))
        .foreach { e =>
          if (e.event_type == "signup") latest = math.max(latest, e.ts_us)
          // latest <= ts guard: state carries the max signup ts across
          // ALL prior batches, so if the feed ever violates the ordered-
          // batch contract a purchase must not attach a FUTURE signup
          // (as-of means at-or-before). Under-attachment from such a
          // feed (signup arriving after its purchase already emitted)
          // is inherent to any online as-of — the ordered-feed contract
          // in the scaladoc is what rules it out.
          else if (latest != Long.MinValue && latest <= e.ts_us)
            out += EnrichedPurchase(e.event_id, key, e.ts_us, latest)
        }
      if (latest != Long.MinValue) state.update(latest)
      out.result().iterator
    }
  }

  final case class ZEvent(user_id: Long, ts_us: Long, event_id: Long,
      v: Long)
  final case class ZAnomaly(user_id: Long, ts_us: Long, event_id: Long,
      v: Long, n_prior: Long)

  /** Streaming per-key z-score anomaly detection: each event is judged
    * against the SAME user's running mean/variance over all PRIOR events
    * (Welford-style, but carried as exact integer (n, Σv, Σv²) so batch
    * and stream agree bit-for-bit). An event is anomalous when its
    * milli-unit value deviates more than 3σ with at least `minPrior`
    * history: (n·v − s)² > 9·(n·q − s²) — the 3σ test cross-multiplied
    * into pure int64 arithmetic, no division, no float fold order.
    *
    * State is THREE longs per key forever (no per-event buffer); rows
    * fold in (ts_us, event_id) order within a batch, so with
    * time-ordered batches (AvailableNow, or an ordered feed across
    * restarts) the output is exactly the batch windowed computation —
    * the st19 driver contract and the StreamingSpec restart test.
    *
    * Integer headroom: the STATE moments are int64, exact while
    * n·v²max < 2⁶³ — at the v ≤ ~5.6·10⁵ milli-units seen here, Σv²
    * holds to n ≈ 3·10⁷ events per key; hotter keys drop to centi-unit
    * scaling or periodically rebase (n, s, q) to a decayed window — the
    * flag is scale-free, so rebasing only changes the history the test
    * sees. The 3σ COMPARISON is exact for any in-range state: the int64
    * cross-multiplied form wraps silently once n·|v| nears 2³¹·√2 (dev²
    * and s² overflow first), so the test takes the int64 fast path only
    * when every intermediate provably fits and otherwise evaluates in
    * BigInt (see [[ZScoreProcessor.isAnomalous]]). The st19 oracle
    * mirrors this by cross-multiplying in HUGEINT, which DuckDB
    * overflow-checks loudly rather than wrapping.
    */
  def streamingZScores(events: Dataset[ZEvent],
      minPrior: Int = 10): Dataset[ZAnomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ZScoreProcessor(minPrior),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class ZState(n: Long, s: Long, q: Long)

  /** The [[streamingZScores]] processor: exact integer moment state. */
  final class ZScoreProcessor(minPrior: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ZEvent, ZAnomaly] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[ZState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[ZState]("moments",
        org.apache.spark.sql.Encoders.product[ZState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ZEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ZAnomaly] = {
      var st = Option(state.get()).getOrElse(ZState(0L, 0L, 0L))
      val out = Seq.newBuilder[ZAnomaly]
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (st.n >= minPrior && zScoreExceeds3Sigma(st.n, st.s, st.q, e.v))
          out += ZAnomaly(key, e.ts_us, e.event_id, e.v, st.n)
        st = ZState(st.n + 1L, st.s + e.v, st.q + e.v * e.v)
      }
      state.update(st)
      out.result().iterator
    }
  }

  /** (n·v − s)² > 9·(n·q − s²), exactly, at any in-range (n, s, q).
    *
    * Fast path: pure int64, taken only when every intermediate provably
    * fits — n·|v| ≤ 2⁶², |s| and |dev| ≤ ⌊√(2⁶³)⌋ (so s² and dev² fit),
    * and 9·n·q ≤ Long.MaxValue (n·q − s² ∈ [0, n·q] by Cauchy–Schwarz,
    * so its 9× fits too). Otherwise BigInt — the slow path only triggers
    * past n·|v| ≈ 3·10⁹, where the old single formulation silently
    * wrapped and flipped verdicts (e.g. a zero-deviation event over a
    * zero-variance history flagged anomalous because 9·n·q wrapped
    * negative). Package-private so ZScoreSpec can pin fast/slow parity
    * against a BigInt reference.
    */
  private[graft] def zScoreExceeds3Sigma(n: Long, s: Long, q: Long,
      v: Long): Boolean = {
    val av = math.max(math.abs(v), 1L)
    val sqrtMax = 3037000499L // floor(sqrt(2^63 - 1))
    if (n <= (1L << 62) / av && math.abs(s) <= sqrtMax &&
        q <= Long.MaxValue / 9L / math.max(n, 1L)) {
      val dev = n * v - s
      if (math.abs(dev) <= sqrtMax)
        return dev * dev > 9L * (n * q - s * s)
    }
    val dev = BigInt(n) * v - s
    dev * dev > 9 * (BigInt(n) * q - BigInt(s) * s)
  }

  /** Sliding-window rates: overlapping `width` windows advancing every
    * `slide`, per event type. Each event lands in width/slide windows (the
    * Expand that Spark plans for sliding windows), then partial+final
    * aggregation as usual; the watermark closes windows whose end has
    * passed. The smoothed-rate counterpart of [[hourlyStats]].
    */
  def slidingStats(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** State-partition provisioning law for keyed streaming state
    * (stream-stream joins, large keyed aggregations):
    * `partitions = clamp(floor, ceil(estimatedStateRows / targetRows), cap)`.
    *
    * The two costs it balances are measured, not assumed
    * (graft.StreamFloorBench, SCALING.md): each state-store INSTANCE
    * carries a fixed per-micro-batch provision/commit/maintenance cost
    * (~1.5 s/batch at 32 instances, ~0.75 s at 8 — proportional to the
    * instance count and data-independent), while per-partition work grows
    * with the rows the partition holds. So small inputs want the floor
    * (the gate's 8 — fewer instances IS the speedup at kilorow scale) and
    * large keyed volumes want rows-per-partition bounded: the sf10 replay
    * measured st05's interval join at 30.4 s on the gate's 8 partitions,
    * where ~1.2M keyed rows per partition swamp the per-instance floor
    * it was provisioned to avoid.
    *
    * `targetRowsPerPartition` = 125k keeps a partition's RocksDB working
    * set in tens of MB for event-sized rows. `cap` bounds instance
    * overhead: state partitioning is fixed per checkpoint at first run,
    * so a deployment sizes cap to its executor-core budget (the local
    * gate caps at 32 = local[32]); re-provisioning means a new
    * checkpoint, which is the documented Structured Streaming contract,
    * not a law of this library.
    */
  def statePartitionsFor(estimatedStateRows: Long, floor: Int = 8,
      cap: Int = 32, targetRowsPerPartition: Long = 125000L): Int = {
    require(floor >= 1 && cap >= floor && targetRowsPerPartition >= 1,
      s"bad sizing args: floor=$floor cap=$cap target=$targetRowsPerPartition")
    val needed = math.ceil(
      math.max(0L, estimatedStateRows).toDouble / targetRowsPerPartition).toLong
    math.min(cap.toLong, math.max(floor.toLong, needed)).toInt
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension DataFrame (re-read per micro-batch, broadcast when small).
    * No watermark is needed on the static side and no join state
    * accumulates — this is the bread-and-butter enrich shape for
    * dimension data at any stream volume.
    */
  def enrichWithDimension(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Stream-stream interval join: each purchase attributed to the same
    * user's signup within the preceding `window`. Both sides carry
    * watermarks, so the join state for expired intervals is dropped — the
    * state store stays bounded on unbounded streams. Works identically on
    * batch inputs (the test oracle).
    */
  def purchaseAttribution(events: DataFrame, window: String = "7 days",
      lateness: String = "10 minutes"): DataFrame =
    attributionJoin(events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "signup"), window, lateness)

  /** The general interval-attribution join over two pre-filtered event
    * streams. With `joinType = "left_outer"` purchases with NO qualifying
    * signup emit a null-signup row once the watermark proves no match can
    * still arrive — the conversion-gap shape (an inner join silently
    * drops exactly the rows a funnel-health monitor needs). Outer-result
    * emission is watermark-driven, so a gate run must advance the final
    * watermark past every purchase's match window (the sentinel fixture);
    * on a real unbounded stream the advancing watermark does it
    * continuously. State stays bounded either way.
    */
  def attributionJoin(purchaseEvents: DataFrame, signupEvents: DataFrame,
      window: String = "7 days", lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val purchases = purchaseEvents
      .withWatermark("event_time", lateness)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("event_time").as("purchase_time"), col("value"))
    val signups = signupEvents
      .withWatermark("event_time", lateness)
      .select(col("user_id").as("s_user_id"),
        col("event_time").as("signup_time"))
    purchases.join(signups,
      col("user_id") === col("s_user_id") &&
        col("signup_time") <= col("purchase_time") &&
        col("signup_time") >= col("purchase_time") - expr(s"INTERVAL $window"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("purchase_time"),
        col("signup_time"), col("value"))
  }

  /** Continuous parquet sink via foreachBatch: each micro-batch of an
    * aggregation stream is appended as parquet (partitioned by any given
    * columns), giving exactly the lake layout batch jobs read back. The
    * checkpoint dir carries offsets + state across restarts.
    */
  def sinkToParquet(df: DataFrame, outDir: String, checkpointDir: String,
      partitionCols: Seq[String] = Seq.empty,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val writer = batch.write.mode("append")
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
         else writer).parquet(outDir)
      }
      .start()

  /** Streaming exact dedup: keep the first occurrence of each `idCols`
    * combination, with state bounded by the event-time watermark —
    * duplicates arriving within the lateness window are dropped, state
    * for expired windows is evicted. This is the ingestion-side tier of
    * the corpus dedup stack ([[graft.ops.Dedup]]): applied at intake it
    * keeps exact re-sends (retries, replayed partitions) out of the lake
    * before any batch near-dup pass runs.
    */
  def dedupStream(events: DataFrame, lateness: String,
      idCols: Seq[String]): DataFrame =
    events
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Read the events table as a file stream (one-file-per-trigger form used
    * in local smoke runs).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(
      spark.readStream.schema(eventsSchemaFor(spark, dir))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))
  }
}
