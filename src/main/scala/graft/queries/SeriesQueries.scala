package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series and distribution surfaces added in round 4: dense-grid
  * gap-filling with forward fill (generator + IGNORE NULLS window) and a
  * fixed-width histogram with cumulative distribution (bucketed aggregate +
  * window-over-aggregate). Integer event-time math (nanos) keeps both
  * engines exact.
  */
object SeriesQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Gap-fill/resample: hourly event counts per type over the FULL dense
      // hour grid (missing hours materialized at 0), plus a forward-filled
      // "last observed count". The grid is a generator over the min..max
      // hour bound — one tiny aggregate row exploded, never a driver loop —
      // and the fill is last(ignoreNulls) over an hour-ordered window
      // partitioned by type, so state per partition is one value.
      "q39_gapfill",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.withColumn("hour", expr("ts div 3600000000000"))
        val perHour = ev.groupBy(col("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_raw"))
        val grid = ev.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
          .crossJoin(ev.select(col("event_type")).distinct())
        val byType = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        grid.join(perHour, Seq("hour", "event_type"), "left")
          .withColumn("n", coalesce(col("n_raw"), lit(0L)))
          .withColumn("n_filled",
            coalesce(last(col("n_raw"), ignoreNulls = true).over(byType), lit(0L)))
          .select((col("hour") * 3600).as("hour_epoch_s"), col("event_type"),
            col("n"), col("n_filled"))
          .orderBy(col("hour_epoch_s"), col("event_type"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour, event_type
        |  FROM events
        |),
        |per AS (SELECT hour, event_type, count(*) AS n_raw FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
        |grid AS (
        |  SELECT g.hour, ty.event_type
        |  FROM (SELECT unnest(range(lo, hi + 1)) AS hour FROM bounds) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) ty
        |),
        |j AS (
        |  SELECT g.hour, g.event_type, p.n_raw
        |  FROM grid g LEFT JOIN per p USING (hour, event_type)
        |)
        |SELECT hour * 3600 AS hour_epoch_s, event_type,
        |       coalesce(n_raw, 0) AS n,
        |       coalesce(last_value(n_raw IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n_filled
        |FROM j
        |ORDER BY hour_epoch_s, event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Fixed-width histogram of order prices with cumulative counts: the
      // bucketed aggregate plus a window over the (tiny) aggregate output.
      // floor((x)/width) is the same IEEE arithmetic on both engines.
      "q40_histogram",
      (s, dir) => {
        val t = Tables(s, dir)
        val binW = 20000.0
        val hist = t.orders
          .withColumn("bin", floor(col("o_totalprice") / binW).cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            round(min(col("o_totalprice")), 2).as("min_price"),
            round(max(col("o_totalprice")), 2).as("max_price"))
        hist
          .withColumn("cum_n",
            sum(col("n")).over(Window.orderBy(col("bin"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("bin"), (col("bin") * binW).as("bin_lo"), col("n"),
            col("cum_n"), col("min_price"), col("max_price"))
          .orderBy(col("bin"))
      },
      Some("""
        |WITH hist AS (
        |  SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bin,
        |         count(*) AS n,
        |         round(min(o_totalprice), 2) AS min_price,
        |         round(max(o_totalprice), 2) AS max_price
        |  FROM orders
        |  GROUP BY 1
        |)
        |SELECT bin, CAST(bin * 20000.0 AS DOUBLE) AS bin_lo, n,
        |       CAST(sum(n) OVER (ORDER BY bin
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |       min_price, max_price
        |FROM hist
        |ORDER BY bin
        |""".stripMargin.trim)),

    QueryDef(
      // SCD type-2 history build: the event log compacted into per-user
      // validity intervals of the observed event_type (consecutive repeats
      // collapse; each change is valid until the next). Microsecond event
      // time — the common precision of the two engines (DuckDB truncates
      // ns on read) — keeps the integer arithmetic exact; the audit
      // aggregates interval counts and closed-interval durations per type.
      // Lake.scd2Intervals is the operator; OpsSpec pins its boundary
      // semantics.
      "q42_scd2",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.Lake.scd2Intervals(
            t.events.select(col("user_id"), expr("ts div 1000").as("tsu"),
              col("event_type"), col("event_id")),
            "user_id", "tsu", "event_type", "event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_intervals"),
            count(when(col("is_current"), 1)).as("n_current"),
            sum(col("valid_to") - col("valid_from")).as("closed_dur_us"),
            max(col("valid_to") - col("valid_from")).as("max_dur_us"))
          .orderBy(col("event_type"))
      },
      Some("""
        |WITH ordered AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tsn, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events
        |),
        |changes AS (
        |  SELECT user_id, event_type, tsn, event_id FROM ordered
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |),
        |iv AS (
        |  SELECT user_id, event_type, tsn AS valid_from,
        |         lead(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id)
        |           AS valid_to
        |  FROM changes
        |)
        |SELECT event_type,
        |       count(*)                                     AS n_intervals,
        |       count(*) FILTER (WHERE valid_to IS NULL)     AS n_current,
        |       CAST(sum(valid_to - valid_from) AS BIGINT)   AS closed_dur_us,
        |       CAST(max(valid_to - valid_from) AS BIGINT)   AS max_dur_us
        |FROM iv
        |GROUP BY event_type
        |ORDER BY event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Sequential funnel conversion: first view -> first click at-or-after
      // that view -> first purchase at-or-after that click, per user; one
      // summary row of stage counts + conversion rates. Each stage is a
      // user-keyed min-aggregate joined to the previous stage's per-user
      // timestamp — |users|-row relations after the first aggregate, so
      // every join past stage one is user-keyed and AQE-broadcastable at
      // any event-log scale. Rates are float divisions of exact integer
      // counts, so the two engines agree bit-for-bit.
      "q43_funnel",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("ts") >= col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") >= col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        ev.select(col("user_id")).distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_users"),
            count(col("t_view")).as("n_view"),
            count(col("t_click")).as("n_click"),
            count(col("t_purchase")).as("n_purchase"))
          .select(col("n_users"), col("n_view"), col("n_click"),
            col("n_purchase"),
            round(col("n_click").cast("double") /
              col("n_view").cast("double"), 4).as("view_to_click"),
            round(col("n_purchase").cast("double") /
              col("n_click").cast("double"), 4).as("click_to_buy"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events
        |),
        |v AS (
        |  SELECT user_id, min(ts) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM ev e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |  GROUP BY e.user_id
        |),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM ev e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |  GROUP BY e.user_id
        |),
        |j AS (
        |  SELECT u.user_id, v.t_view, c.t_click, p.t_purchase
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  LEFT JOIN v USING (user_id)
        |  LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |)
        |SELECT count(*) AS n_users,
        |       count(t_view) AS n_view,
        |       count(t_click) AS n_click,
        |       count(t_purchase) AS n_purchase,
        |       round(CAST(count(t_click) AS DOUBLE) /
        |             CAST(count(t_view) AS DOUBLE), 4) AS view_to_click,
        |       round(CAST(count(t_purchase) AS DOUBLE) /
        |             CAST(count(t_click) AS DOUBLE), 4) AS click_to_buy
        |FROM j
        |""".stripMargin.trim)),

    QueryDef(
      // Rolling z-score anomaly detection: hourly event counts per type on
      // the dense hour grid (q39's generator — so the trailing frame always
      // spans real consecutive hours), scored against the PRECEDING 24
      // hours only (no leakage of the scored point into its own baseline).
      // The frame's mean/variance come from integer sum / sum-of-squares
      // window aggregates; z is then ONE float expression over exact
      // integers, so Spark and DuckDB agree bit-for-bit — no stddev_samp
      // summation-order drift. Emits hours with |z| > 2.5 over a full
      // 24-hour baseline with positive variance (both gates integer-exact).
      "q44_anomaly",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.withColumn("hour", expr("ts div 3600000000000"))
        val perHour = ev.groupBy(col("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_raw"))
        val grid = ev.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
          .crossJoin(ev.select(col("event_type")).distinct())
        val dense = grid.join(perHour, Seq("hour", "event_type"), "left")
          .withColumn("n", coalesce(col("n_raw"), lit(0L)))
        val frame = Window.partitionBy(col("event_type"))
          .orderBy(col("hour")).rowsBetween(-24, -1)
        dense
          .withColumn("w", count(lit(1)).over(frame))
          .withColumn("s", sum(col("n")).over(frame))
          .withColumn("s2", sum(col("n") * col("n")).over(frame))
          .filter(col("w") === 24 && col("s2") * 24 > col("s") * col("s"))
          .withColumn("z",
            round((col("n").cast("double") - col("s").cast("double") / 24.0d) /
              sqrt((col("s2").cast("double") -
                col("s").cast("double") * col("s").cast("double") / 24.0d) /
                23.0d), 4))
          .filter(abs(col("z")) > 2.5)
          .select((col("hour") * 3600).as("hour_epoch_s"), col("event_type"),
            col("n"), col("z"))
          .orderBy(col("hour_epoch_s"), col("event_type"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour,
        |         event_type
        |  FROM events
        |),
        |per AS (SELECT hour, event_type, count(*) AS n_raw FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
        |grid AS (
        |  SELECT g.hour, ty.event_type
        |  FROM (SELECT unnest(range(lo, hi + 1)) AS hour FROM bounds) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) ty
        |),
        |dense AS (
        |  SELECT g.hour, g.event_type, coalesce(p.n_raw, 0) AS n
        |  FROM grid g LEFT JOIN per p USING (hour, event_type)
        |),
        |win AS (
        |  SELECT hour, event_type, n,
        |         count(*) OVER f AS w,
        |         sum(n) OVER f AS s,
        |         sum(n * n) OVER f AS s2
        |  FROM dense
        |  WINDOW f AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |),
        |scored AS (
        |  SELECT hour, event_type, n,
        |         round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / 24.0) /
        |               sqrt((CAST(s2 AS DOUBLE) -
        |                     CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 24.0) /
        |                    23.0), 4) AS z
        |  FROM win
        |  WHERE w = 24 AND s2 * 24 > s * s
        |)
        |SELECT hour * 3600 AS hour_epoch_s, event_type, n, z
        |FROM scored
        |WHERE abs(z) > 2.5
        |ORDER BY hour_epoch_s, event_type
        |""".stripMargin.trim)),

    QueryDef(
      // Cohort retention: users grouped by first-seen week; for each
      // (cohort, weeks-since) cell, how many distinct users were active —
      // the classic retention triangle. All integer week arithmetic on
      // event-time nanos, so the cell counts are engine-exact. Two keyed
      // aggregates: per-user first week (|users| rows), then the
      // (user, week) distinct activity joined user-keyed against it —
      // the join side is |users|-bounded and AQE-broadcastable at scale.
      "q45_cohorts",
      (s, dir) => {
        val t = Tables(s, dir)
        val weekNs = 7L * 24 * 3600 * 1000000000L
        val ev = t.events.select(col("user_id"),
          expr(s"ts div $weekNs").as("wk"))
        val activity = ev.distinct()
        val firstWk = ev.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        activity.join(firstWk, Seq("user_id"))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .select((col("cohort_wk") * 7 * 24 * 3600).as("cohort_epoch_s"),
            col("week_offset"), col("n_users"))
          .orderBy(col("cohort_epoch_s"), col("week_offset"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT DISTINCT user_id,
        |         CAST(epoch_ns(ts) // 604800000000000 AS BIGINT) AS wk
        |  FROM events
        |),
        |first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
        |SELECT cohort_wk * 604800 AS cohort_epoch_s,
        |       wk - cohort_wk AS week_offset,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN first USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2
        |""".stripMargin.trim)),

    QueryDef(
      // Recursive hierarchy closure (WITH RECURSIVE, Spark 4's iterative
      // CTE operator — SPARK-24497): parts form a deterministic forest
      // via parent = p_partkey div 10 (keys are contiguous, so every
      // non-root's parent exists), and the closure carries (root, depth)
      // down the tree. Execution is depth-bounded iteration — each step
      // joins only the FRONTIER level against the parent key, so shuffle
      // volume per step follows the level size and the step count is
      // log10(max key) at any scale (7 levels for 10^7 parts) — the
      // BFS-doubling shape a driver loop would hand-roll, run natively
      // by the engine. Per-depth stats are engine-exact: integer
      // counts + one double sum rounded at 2 (|values| <= corpus keys,
      // summation-order drift ~1e-10 vs the cent scale).
      "q46_hierarchy",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.createOrReplaceTempView("part_q46")
        s.sql("""
          WITH RECURSIVE anc AS (
            SELECT p_partkey AS pk, p_partkey AS root, 0 AS depth,
                   p_retailprice AS price
            FROM part_q46 WHERE p_partkey < 10
            UNION ALL
            SELECT p.p_partkey, a.root, a.depth + 1, p.p_retailprice
            FROM part_q46 p JOIN anc a ON p.p_partkey div 10 = a.pk
            WHERE p.p_partkey >= 10
          )
          SELECT depth, count(*) AS n_nodes,
                 count(DISTINCT root) AS n_roots,
                 round(sum(price), 2) AS sum_price
          FROM anc GROUP BY depth ORDER BY depth""")
      },
      Some("""
        |WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS pk, p_partkey AS root, 0 AS depth,
        |         p_retailprice AS price
        |  FROM part WHERE p_partkey < 10
        |  UNION ALL
        |  SELECT p.p_partkey, a.root, a.depth + 1, p.p_retailprice
        |  FROM part p JOIN anc a ON p.p_partkey // 10 = a.pk
        |  WHERE p.p_partkey >= 10
        |)
        |SELECT depth, count(*) AS n_nodes,
        |       count(DISTINCT root) AS n_roots,
        |       round(sum(price), 2) AS sum_price
        |FROM anc GROUP BY depth ORDER BY depth
        |""".stripMargin.trim)),

    QueryDef(
      // Rolling distinct count (trailing 3-day active users per day) —
      // the sliding-window cardinality a DAU/WAU dashboard needs. Sets
      // don't compose under windows, so instead of a per-day set window
      // each event CONTRIBUTES to the <=3 window-ends it falls in (a
      // bounded explode: linear, each row shuffles <=3 rows) and the
      // exact countDistinct runs per window end. The SAME explode applied
      // to per-day HLL SKETCH rows (|days| KB-sized rows, not events)
      // gives the 100 TB path — dailies once, sliding unions on sketch
      // rows — and its estimate is checked within 5% of the exact count
      // in-query (a03's measured-accuracy pattern; both paths ride one
      // query). Window ends with no day in the data are dropped (join
      // with the observed-day set), so the grid is data-defined.
      "q49_rolling_uniques",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.select(
          expr("ts div 86400000000000").as("day"), col("user_id"))
        val days = ev.select(col("day")).distinct()
        val exact = ev
          .select(explode(sequence(col("day"), col("day") + 2)).as("wday"),
            col("user_id"))
          .join(days.withColumnRenamed("day", "wday"), Seq("wday"),
            "left_semi")
          .groupBy(col("wday"))
          .agg(countDistinct(col("user_id")).as("uniques_3d"))
        val daily = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val est = daily
          .select(explode(sequence(col("day"), col("day") + 2)).as("wday"),
            col("sk"))
          .join(days.withColumnRenamed("day", "wday"), Seq("wday"),
            "left_semi")
          .groupBy(col("wday"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        exact.join(est, Seq("wday"))
          .select(col("wday").as("day"), col("uniques_3d"),
            (abs(col("est") - col("uniques_3d")) <=
              col("uniques_3d").cast("double") * 0.05).as("sketch_ok"))
          .orderBy(col("day"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
        |         user_id
        |  FROM events
        |),
        |days AS (SELECT DISTINCT day FROM ev)
        |SELECT d.day,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS uniques_3d,
        |       TRUE AS sketch_ok
        |FROM days d JOIN ev e ON e.day BETWEEN d.day - 2 AND d.day
        |GROUP BY d.day
        |ORDER BY d.day
        |""".stripMargin.trim)),

    QueryDef(
      // First-order Markov transition matrix over per-user event
      // sequences — the session-flow model behind next-action prediction
      // and funnel-drop diagnosis: P(next_type | type) with exact counts.
      // One lead() window per user (ONE user-keyed exchange at any log
      // size) then a |types|^2-bounded aggregate; probabilities divide
      // exact integers and round at 6. Ordering ties pin on
      // (microsecond ts, event_id) — the µs truncation rule both engines
      // share (TESTDATA gotcha: DuckDB reads ns parquet as µs).
      "q52_transitions",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        val seq = t.events
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
        seq.groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(col("event_type"))), 6))
          .orderBy(col("event_type"), col("next_type"))
      },
      Some("""
        |WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events
        |),
        |c AS (
        |  SELECT event_type, next_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT event_type, next_type, n,
        |       round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6) AS p
        |FROM c
        |ORDER BY event_type, next_type
        |""".stripMargin.trim)),

    QueryDef(
      // Exponentially time-decayed engagement score per user — the
      // feature-store recency aggregate (half-life weighting is the
      // standard freshness prior for ranking/recommendation features):
      // score = sum(value * 2^(-age/half_life)) with a 7-day half-life,
      // age measured from the corpus max event time. Map-only decay with
      // the one-row max broadcast back in (no driver round-trip), then
      // ONE user-keyed partial+final aggregation — at any log size the
      // exchange carries users, not events. The decay constant ln2/7 is
      // pinned as the same decimal literal in both engines (libm ln(2)
      // would be engine-local); exp drifts <= 1 ulp per term, so the
      // per-user sum rounds at 4 (t19's rule).
      "q53_decay",
      (s, dir) => {
        val t = Tables(s, dir)
        val lambdaPerDay = 0.09902102579427789 // ln(2)/7, pinned literal
        val mx = t.events.agg(max(expr("ts div 1000")).as("m"))
        t.events
          .select(col("user_id"), expr("ts div 1000").as("tsu"), col("value"))
          .crossJoin(broadcast(mx))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value") * exp(lit(-lambdaPerDay) *
              ((col("m") - col("tsu")).cast("double") / lit(86400000000.0)))),
              4).as("score"))
          .orderBy(col("user_id"))
      },
      Some("""
        |WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
        |SELECT user_id, count(*) AS n_events,
        |       round(sum(value * exp(-0.09902102579427789 *
        |         CAST(mx.m - epoch_us(ts) AS DOUBLE) / 86400000000.0)), 4)
        |         AS score
        |FROM events, mx
        |GROUP BY user_id
        |ORDER BY user_id
        |""".stripMargin.trim)),

    QueryDef(
      // Cohort retention matrix — the week-0/1/2/3 "do users come back"
      // grid product analytics reads first (q45's cohort machinery
      // widened from a single aggregate to the offset matrix): users
      // cohorted by FIRST active epoch-week, a cell counts cohort
      // members active `offset` weeks later. Exact distinct counts;
      // retention divides exact integers and rounds at 6; the µs
      // truncation rule pins week boundaries cross-engine. Scale shape:
      // the (user, week) activity relation is ONE distinct aggregation
      // off the log; the cohort map is user-bounded; the matrix is
      // |weeks| x 4 rows.
      "q54_retention",
      (s, dir) => {
        val t = Tables(s, dir)
        val act = t.events
          .select(col("user_id"),
            expr("(ts div 1000) div 3600000000").as("wk"))
          .distinct()
        val cohort = act.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
        val coSize = cohort.groupBy(col("cwk"))
          .agg(count(lit(1)).as("n_cohort"))
        act.join(cohort, "user_id")
          .withColumn("offset", col("wk") - col("cwk"))
          .filter(col("offset") <= 3)
          .groupBy(col("cwk"), col("offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(coSize, "cwk")
          .select(col("cwk").as("cohort_hour"), col("offset"),
            col("n_active"), col("n_cohort"),
            round(col("n_active").cast("double") / col("n_cohort"), 6)
              .as("retention"))
          .orderBy(col("cohort_hour"), col("offset"))
      },
      Some("""
        |WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS wk
        |  FROM events
        |),
        |cohort AS (SELECT user_id, min(wk) AS cwk FROM act GROUP BY user_id),
        |cs AS (SELECT cwk, count(*) AS n_cohort FROM cohort GROUP BY cwk),
        |cells AS (
        |  SELECT c.cwk, a.wk - c.cwk AS "offset",
        |         count(DISTINCT a.user_id) AS n_active
        |  FROM act a JOIN cohort c ON a.user_id = c.user_id
        |  WHERE a.wk - c.cwk <= 3
        |  GROUP BY 1, 2
        |)
        |SELECT cells.cwk AS cohort_hour, "offset", n_active, n_cohort,
        |       round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
        |FROM cells JOIN cs ON cs.cwk = cells.cwk
        |ORDER BY cohort_hour, "offset"
        |""".stripMargin.trim))
  )
}
