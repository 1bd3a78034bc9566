package graft.streaming

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Streaming surface, batch-mode equivalents (SURVEY.md §2c): tumbling /
 * sliding / session windows and dedup over the `events` table. The same
 * transformations run under Structured Streaming in
 * [[graft.streaming.StreamPipelines]] (readStream + watermark), which the
 * driver's batch Verify can't oracle-check; these batch twins pin the
 * semantics against DuckDB.
 *
 * Scale notes (100 TB): time-window aggs shuffle by (window, key) with
 * map-side partials; session windows shuffle by user then merge in-state;
 * skewed users are handled by AQE skew-split in batch and by state-store
 * partitioning in streaming. At cluster scale `events` would be
 * date-partitioned so window queries prune to the hot partitions.
 */
object EventOps {

  val queries: Map[String, QFn] = Map(
    "stream_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Q.moneySum(col("value")).as("sum_value"))
        .select(col("w.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    "stream_sliding" -> ((s, d) => {
      // 1h windows every 15min: each event lands in 4 overlapping windows.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), Q.moneySum(col("value")).as("sum_value"))
        .select(col("w.start").cast("timestamp_ntz").as("w_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("w_start"))
    }),

    "stream_session" -> ((s, d) => {
      // Per-user sessions with a 30-minute inactivity gap. Spark's
      // session_window end = last event + gap, so last_ts = end - 30m.
      // The DuckDB oracle is the gaps-and-islands formulation; a new
      // session starts when the gap is >= 30m (matching Spark's
      // [start, end) window-merge semantics). The aggregate itself is
      // StreamPipelines.sessionAgg — the SAME function that builds the
      // watermarked streaming query (StreamingSpec), so batch twin and
      // stream share the session rule by construction.
      StreamPipelines.sessionAgg(Tables.events(s, d))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "event_funnel" -> ((s, d) => {
      // Ordered funnel: signup → first click at/after signup → first
      // purchase at/after that click. Three aggregates, each a broadcast
      // join on the (small) per-user milestone frame — the standard
      // scalable funnel shape (no per-user collect).
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val signup = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("st"))
      val click = e.filter(col("event_type") === "click").as("e")
        .join(signup.as("s"), col("e.user_id") === col("s.user_id") && col("e.ts") >= col("st"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("ts")).as("ct"))
      val purchase = e.filter(col("event_type") === "purchase").as("e")
        .join(click.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") >= col("ct"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("ts")).as("pt"))
      e.select(col("user_id")).distinct()
        .join(signup, Seq("user_id"), "left")
        .join(click, Seq("user_id"), "left")
        .join(purchase, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("pt").isNotNull, "purchase")
            .when(col("ct").isNotNull, "click")
            .when(col("st").isNotNull, "signup")
            .otherwise("none").as("funnel_stage"))
        .orderBy(col("user_id"))
    }),

    "event_attribution" -> ((s, d) => {
      // First-/last-touch marketing attribution: each purchase is
      // credited to the most recent preceding channel event (click /
      // view / signup — errors and purchases are not channels) and to
      // the user's earliest channel event. One shuffle by user_id, two
      // running window frames over it — the window key is the user, so
      // the shuffle spreads over the user population at any scale;
      // purchases with no prior channel attribute to 'none' (the frame
      // is empty → NULL → coalesced), never to a later event.
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"), col("value"))
      val isChannel = col("event_type").isin("click", "view", "signup")
      val touch = when(isChannel, col("event_type"))
      val touchTs = when(isChannel, col("ts"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("last_touch", last(touch, ignoreNulls = true).over(wPrev))
        .withColumn("last_touch_ts",
          last(touchTs, ignoreNulls = true).over(wPrev))
        .withColumn("first_touch",
          first(touch, ignoreNulls = true).over(wPrev))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("value"),
          coalesce(col("last_touch"), lit("none")).as("last_touch"),
          col("last_touch_ts").cast("timestamp_ntz").as("last_touch_ts"),
          coalesce(col("first_touch"), lit("none")).as("first_touch"))
        .orderBy(col("event_id"))
    }),

    "event_cohort" -> ((s, d) => {
      // Weekly cohort retention: users bucketed by first-seen week,
      // counted per week-offset of later activity.
      val e = Tables.events(s, d).select(col("user_id"), col("ts"))
      val cohort = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      e.withColumn("activity_week", date_trunc("week", col("ts")))
        .join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("activity_week"), col("cohort_week")) / 7).cast("long")
            .as("wk_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
          col("wk_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("wk_offset"))
    }),

    "stream_dedup" -> ((s, d) => {
      // Deterministic dropDuplicates: keep the earliest-ts row per
      // event_id (row_number, not dropDuplicates, whose survivor is
      // partition-order-dependent).
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ts"), col("user_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts").cast("timestamp_ntz").as("ts"))
        .orderBy(col("event_id"))
    }),

    "event_rfm" -> ((s, d) => {
      // RFM profile per user: recency (last activity), frequency (event
      // count), monetary (decimal-summed purchase value) — the standard
      // behavioral segmentation input. One hash agg, shuffle volume =
      // #users; the conditional sum uses a FILTER-style when() so all
      // three land in one scan.
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          max(col("ts")).cast("timestamp_ntz").as("last_seen"),
          count(lit(1)).as("frequency"),
          Q.moneySum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("monetary"))
        .orderBy(col("user_id"))
    }),

    "upsert_latest" -> ((s, d) => {
      // Batch twin of the streaming keyed-upsert sink (StreamPipelines
      // .upsertBatch): the state a last-write-wins MERGE target holds
      // after ingesting every event — exactly one row per key, ties on
      // ts broken by event_id (the sink's orderCol total order). One
      // shuffle by key, window rank in-partition; the oracle proves the
      // merge semantics relationally.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    "cdc_snapshot_diff" -> ((s, d) => {
      // Change-data-capture between two snapshots of the keyed user
      // state (the `upsert_latest` MERGE target as of Jan 16 vs end of
      // stream): which keys appeared (insert) and which changed their
      // current row (update) — the diff an incremental downstream load
      // consumes instead of re-reading the full table. Append-only
      // source ⇒ no deletes by construction (documented; a full CDC on
      // a deleting source adds the symmetric left-null arm). Shape: two
      // window-dedup passes + one full outer join on the key — shuffle
      // keyed on user_id throughout, output bounded by changed keys.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      def stateAt(cut: Option[String]) = {
        val base = Tables.events(s, d)
        cut.fold(base)(c => base.filter(col("ts") < lit(c).cast("timestamp")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"))
      }
      val old = stateAt(Some("2024-01-16"))
        .withColumnRenamed("event_id", "old_event_id")
        .withColumnRenamed("event_type", "old_type")
      val now = stateAt(None)
        .withColumnRenamed("event_id", "new_event_id")
        .withColumnRenamed("event_type", "new_type")
      old.join(now, Seq("user_id"), "full")
        .filter(col("old_event_id").isNull ||
          col("new_event_id") =!= col("old_event_id"))
        .select(col("user_id"),
          when(col("old_event_id").isNull, "insert").otherwise("update")
            .as("change"),
          coalesce(col("old_event_id"), lit(-1L)).as("old_event_id"),
          col("new_event_id"), col("new_type"))
        .orderBy(col("user_id"))
    }),

    "event_anomaly" -> ((s, d) => {
      // Per-user z-score outliers: events whose value sits ≥ 2.5 sample
      // standard deviations from that user's own mean — the
      // metric-anomaly shape (fraud spikes, telemetry outliers). Whole-
      // partition window aggregates = one shuffle by user, no second
      // scan and no join against a stats table. The filter compares the
      // ROUNDED z on both engines so the 4dp fp agreement also decides
      // the boundary identically.
      val byUser = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("mu", avg(col("value")).over(byUser))
        .withColumn("sd", stddev_samp(col("value")).over(byUser))
        .filter(col("sd") > 0)
        .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
        .filter(abs(col("z")) >= 2.5)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("z"))
        .orderBy(col("event_id"))
    }),

    "event_ewma" -> ((s, d) => {
      // Exponentially-weighted moving average (α = 0.5) of `value` over
      // each user's timeline — the decay-score shape (engagement decay,
      // rate smoothing). EWMA is inherently a per-key SEQUENTIAL fold
      // (state_i depends on state_{i-1}), which no window frame
      // expresses. This batch form (ewmaBatch below) is the ORACLE
      // STAND-IN: it collects each user's ordered events into one task,
      // so per-task memory is O(events-per-hottest-key) — measured fine
      // through a planted 200 k-event single user (OperatorSpec hot-key
      // property, ~10 MB of task state), but a key with 10⁸ events needs
      // the SCALE PATH: StreamPipelines.statefulEwma, the
      // transformWithState twin with O(1) state per key and bit-parity
      // asserted in StreamingSpec. Exact arm / scale arm — the same
      // pairing dedup_near ↔ minhash_lsh declares.
      ewmaBatch(Tables.events(s, d)).orderBy(col("event_id"))
    }),

    "event_holt" -> ((s, d) => {
      // Holt double exponential smoothing (level + trend, α = β = 0.5)
      // over each user's value timeline — the one-step-ahead
      // forecasting shape (rate projection, engagement trajectory)
      // that EWMA cannot express because a flat average has no slope
      // state. Same architecture as event_ewma: per-key sequential
      // fold, collected-ordered-array batch arm as the oracle stand-in
      // (O(events-per-hottest-key) per task), with
      // StreamPipelines.statefulHolt as the O(1)-state-per-key scale
      // arm (bit-parity asserted in StreamingSpec). α = β = 0.5 keeps
      // every multiply binary-exact; level/trend/forecast emit as the
      // shared floor(x·10⁴ + 0.5) integer basis points.
      holtBatch(Tables.events(s, d)).orderBy(col("event_id"))
    }),

    "event_transitions" -> ((s, d) => {
      // Behavioral transition matrix: count of (event_type → next type)
      // per user timeline — the input to Markov/journey analysis. One
      // shuffle by user for the lead window, one hash agg of at most
      // |types|² groups.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "event_locf" -> ((s, d) => {
      // Forward-fill (last observation carried forward) over the dense
      // hourly series — the other standard time-series repair next to
      // event_gap_fill's zero-fill: VALUE metrics (avg ticket size,
      // sensor reading) must carry the last real observation across
      // silent hours, not drop to 0. Same grid mechanism as
      // event_gap_fill; the fill itself is one `last(_, ignoreNulls)`
      // running window per type — no self-join, no driver loop. The
      // hourly avg is rounded BEFORE the fill so both engines carry
      // bit-identical values; leading gaps (before the first
      // observation) fill with 0.0 explicitly.
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(Q.moneyAvg(col("value")).as("avg_value"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val types = ev.select(col("event_type")).distinct()
      val wFill = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hours.crossJoin(broadcast(types))
        .join(hourly, Seq("h", "event_type"), "left")
        .withColumn("was_gap", col("avg_value").isNull.cast("long"))
        .withColumn("filled",
          last(col("avg_value"), ignoreNulls = true).over(wFill))
        .select(col("h").cast("timestamp_ntz").as("hour"), col("event_type"),
          col("was_gap"), coalesce(col("filled"), lit(0.0)).as("value_filled"))
        .orderBy(col("event_type"), col("hour"))
    }),

    "event_sessionize" -> ((s, d) => {
      // Per-EVENT session assignment (gaps-and-islands): every event gets
      // its user's running session sequence number — the row-level
      // complement of stream_session's per-session AGGREGATES (same
      // 30-minute-gap rule, so the two stay consistent), and the thing a
      // downstream attribution/journey query joins on. One shuffle by
      // user, two window passes over it (lag, then running sum) — no
      // joins, no second scan. Tiebreak on (ts, event_id) keeps the lag
      // deterministic under equal timestamps. The gap test compares
      // MICROSECOND deltas (events.ts carries µs precision): a
      // second-truncated compare flips events whose true gap straddles
      // the 30-min boundary by < 1 s, diverging from both the oracle's
      // INTERVAL comparison and stream_session's session_window rule.
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("prev", lag(col("ts"), 1).over(wU))
        .withColumn("new_s",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) >=
              1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_s"))
          .over(wU.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("session_seq"))
        .orderBy(col("event_id"))
    }),

    "pipeline_observe" -> ((s, d) => {
      // Operational-analytics composed flagship (the sixth; the events-
      // side sibling of llm.Curate's corpus chains), fused as ONE plan:
      //
      //  1. enrich   — events × customer segment (broadcast dim, left
      //                join + UNKNOWN bucket, the stream_enrich shape);
      //  2. densify  — hourly (segment × hour) grid with explicit zeros
      //                (the event_gap_fill shape — a silent outage IS
      //                the anomaly the zeros exist to expose);
      //  3. detect   — per-segment z-score over the dense series
      //                (the event_anomaly shape): hours whose volume
      //                sits ≥ 2.5σ from that segment's own mean,
      //                including zero-volume hours.
      //
      // This is the monitoring pipeline an engine operator runs over its
      // own run-history stream. Scale: raw events touched once (one
      // hash agg keyed (segment, hour)); the grid is generated, not
      // scanned; the window partitions by segment over #hours rows.
      // Boundary decided on the ROUNDED z on both engines.
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val hourly = Tables.events(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val bounds = Tables.events(s, d).agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val segs = hourly.select(col("segment")).distinct()
      val bySeg = Window.partitionBy(col("segment"))
      hours.crossJoin(broadcast(segs))
        .join(hourly, Seq("segment", "h"), "left")
        .select(col("segment"), col("h"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .withColumn("mu", avg(col("n_events")).over(bySeg))
        .withColumn("sd", stddev_samp(col("n_events")).over(bySeg))
        .filter(col("sd") > 0)
        .withColumn("z", round((col("n_events") - col("mu")) / col("sd"), 4))
        .filter(abs(col("z")) >= 2.5)
        .select(col("segment"), col("h").cast("timestamp_ntz").as("hour"),
          col("n_events"), col("z"))
        .orderBy(col("segment"), col("hour"))
    }),

    "event_gap_fill" -> ((s, d) => {
      // Time-series gap filling: a dense (hour × event_type) grid over
      // the corpus's span with explicit zero rows where nothing happened
      // — dashboards and anomaly detectors need the zeros (a missing
      // bucket is indistinguishable from "no data arrived" otherwise).
      // Shape: the big side is ONE hash agg of events (shuffle =
      // #buckets); the grid is generated from a 1-row bounds frame
      // (sequence + explode) crossed with the distinct type set — both
      // tiny by construction, so the cross is broadcast work, and the
      // final left join keys on (hour, type) against the pre-aggregated
      // counts, never against raw events.
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val types = ev.select(col("event_type")).distinct()
      hours.crossJoin(broadcast(types))
        .join(hourly, Seq("h", "event_type"), "left")
        .select(col("h").cast("timestamp_ntz").as("hour"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy(col("hour"), col("event_type"))
    }),

    "stream_enrich" -> ((s, d) => {
      // Batch twin of StreamPipelines.enrichBySegment (stream–static
      // dimension join) — the SAME function body, so the streaming query
      // StreamingSpec drives and this oracle-checked twin cannot drift.
      // events.user_id starts at 0 but c_custkey at 1, so the UNKNOWN
      // bucket is non-empty by construction — the left-join-miss path is
      // exercised at every sf.
      StreamPipelines.enrichBySegment(
          Tables.events(s, d),
          Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")))
        .orderBy(col("segment"), col("event_type"))
    }))

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS w_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "stream_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |w AS (SELECT MAKE_TIMESTAMP(
        |   (EPOCH_US(ts) // 900000000 - o.o) * 900000000) AS w_start, value
        |  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) o(o))
        |SELECT w_start, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY w_start ORDER BY w_start""".stripMargin,

    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s AS (SELECT user_id, MIN(ts) AS st FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM e
        |  JOIN s ON e.user_id = s.user_id AND e.ts >= s.st
        |  WHERE event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM e
        |  JOIN c ON e.user_id = c.user_id AND e.ts >= c.ct
        |  WHERE event_type = 'purchase' GROUP BY e.user_id)
        |SELECT u.user_id,
        | CASE WHEN pt IS NOT NULL THEN 'purchase'
        |      WHEN ct IS NOT NULL THEN 'click'
        |      WHEN st IS NOT NULL THEN 'signup'
        |      ELSE 'none' END AS funnel_stage
        |FROM (SELECT DISTINCT user_id FROM e) u
        | LEFT JOIN s ON u.user_id = s.user_id
        | LEFT JOIN c ON u.user_id = c.user_id
        | LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,

    // LAST_VALUE/FIRST_VALUE IGNORE NULLS over the same running frame
    // Spark uses (parity proven by event_locf); empty frame → NULL.
    "event_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        | t AS (SELECT *,
        |   LAST_VALUE(CASE WHEN event_type IN ('click','view','signup')
        |       THEN event_type END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS last_touch,
        |   LAST_VALUE(CASE WHEN event_type IN ('click','view','signup')
        |       THEN ts END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS last_touch_ts,
        |   FIRST_VALUE(CASE WHEN event_type IN ('click','view','signup')
        |       THEN event_type END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS first_touch
        |  FROM e)
        |SELECT event_id, user_id, ts, value,
        | COALESCE(last_touch, 'none') AS last_touch, last_touch_ts,
        | COALESCE(first_touch, 'none') AS first_touch
        |FROM t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "event_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |co AS (SELECT user_id,
        |   CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM e GROUP BY user_id)
        |SELECT cohort_week,
        | DATE_DIFF('day', cohort_week,
        |   CAST(DATE_TRUNC('week', ts) AS TIMESTAMP)) // 7 AS wk_offset,
        | COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN co ON e.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, wk_offset""".stripMargin,

    "stream_dedup" ->
      """SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) = 1
        |ORDER BY event_id""".stripMargin,

    // Grid as in event_gap_fill; the fill is LAST_VALUE IGNORE NULLS over
    // the same running frame Spark uses.
    "event_locf" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |           FROM events),
        | c AS (SELECT DATE_TRUNC('hour', ts) AS h, event_type,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(*), 4) AS avg_value
        |   FROM e GROUP BY 1, 2),
        | b AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS h0,
        |              DATE_TRUNC('hour', MAX(ts)) AS h1 FROM e),
        | hrs AS (SELECT UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM b),
        | ty AS (SELECT DISTINCT event_type FROM e),
        | g AS (SELECT event_type, h, avg_value
        |       FROM hrs CROSS JOIN ty LEFT JOIN c USING (h, event_type))
        |SELECT h AS hour, event_type,
        | CAST(avg_value IS NULL AS BIGINT) AS was_gap,
        | COALESCE(LAST_VALUE(avg_value IGNORE NULLS) OVER (
        |     PARTITION BY event_type ORDER BY h
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
        |   AS value_filled
        |FROM g ORDER BY event_type, hour""".stripMargin,

    // Same gaps-and-islands rule as stream_session's oracle, emitted
    // per event instead of per session.
    "event_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        | g AS (SELECT event_id, user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, ts,
        | CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_seq
        |FROM g ORDER BY event_id""".stripMargin,

    // The same three fused stages: enrich → densify → detect.
    "pipeline_observe" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
        | hourly AS (SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        |    DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n
        |  FROM e LEFT JOIN customer ON user_id = c_custkey GROUP BY 1, 2),
        | b AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS h0,
        |              DATE_TRUNC('hour', MAX(ts)) AS h1 FROM e),
        | hrs AS (SELECT UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM b),
        | segs AS (SELECT DISTINCT segment FROM hourly),
        | grid AS (SELECT segment, h, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
        |   FROM hrs CROSS JOIN segs LEFT JOIN hourly USING (segment, h)),
        | z AS (SELECT segment, h, n_events,
        |    AVG(n_events) OVER (PARTITION BY segment) AS mu,
        |    STDDEV_SAMP(n_events) OVER (PARTITION BY segment) AS sd
        |  FROM grid)
        |SELECT segment, h AS hour, n_events,
        | ROUND((n_events - mu) / sd, 4) AS z
        |FROM z WHERE sd > 0 AND ABS(ROUND((n_events - mu) / sd, 4)) >= 2.5
        |ORDER BY segment, hour""".stripMargin,

    "event_gap_fill" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        | c AS (SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n
        |       FROM e GROUP BY 1, 2),
        | b AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS h0,
        |              DATE_TRUNC('hour', MAX(ts)) AS h1 FROM e),
        | hrs AS (SELECT UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM b),
        | ty AS (SELECT DISTINCT event_type FROM e)
        |SELECT h AS hour, event_type, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
        |FROM hrs CROSS JOIN ty LEFT JOIN c USING (h, event_type)
        |ORDER BY hour, event_type""".stripMargin,

    "stream_enrich" ->
      """SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY segment, event_type""".stripMargin,

    "event_rfm" ->
      """SELECT user_id, CAST(MAX(ts) AS TIMESTAMP) AS last_seen,
        | COUNT(*) AS frequency,
        | CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        |   ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "upsert_latest" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_snapshot_diff" ->
      """WITH o AS (SELECT user_id, event_id AS old_event_id
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        | n AS (SELECT user_id, event_id AS new_event_id,
        |    event_type AS new_type
        |  FROM events
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT user_id,
        | CASE WHEN old_event_id IS NULL THEN 'insert' ELSE 'update' END
        |   AS change,
        | COALESCE(old_event_id, -1) AS old_event_id,
        | new_event_id, new_type
        |FROM o FULL JOIN n USING (user_id)
        |WHERE old_event_id IS NULL OR new_event_id <> old_event_id
        |ORDER BY user_id""".stripMargin,

    "event_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    AVG(value) OVER (PARTITION BY user_id) AS mu,
        |    STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
        |  FROM events)
        |SELECT event_id, user_id, event_type, value,
        | ROUND((value - mu) / sd, 4) AS z
        |FROM e
        |WHERE sd > 0 AND ABS(ROUND((value - mu) / sd, 4)) >= 2.5
        |ORDER BY event_id""".stripMargin,

    // LIST_REDUCE is an acc-first left fold seeded with the first
    // element — exactly the Spark aggregate() above; parallel UNNESTs
    // zip positionally.
    "event_ewma" ->
      """WITH s AS (SELECT user_id,
        |    LIST(value ORDER BY ts, event_id) AS vals,
        |    LIST(event_id ORDER BY ts, event_id) AS eids
        |  FROM events GROUP BY user_id),
        |p AS (SELECT user_id,
        |    UNNEST(eids) AS event_id,
        |    UNNEST(vals) AS value,
        |    UNNEST(LIST_TRANSFORM(RANGE(1, LEN(vals) + 1),
        |      i -> LIST_REDUCE(vals[1:i], (a, x) -> 0.5 * x + 0.5 * a))) AS ew
        |  FROM s)
        |SELECT event_id, user_id, value,
        | CAST(FLOOR(ew * 10000 + 0.5) AS BIGINT) AS ewma_bp
        |FROM p ORDER BY event_id""".stripMargin,

    // Recursive CTE, one step per (user, i) — NOT list_reduce: DuckDB
    // 1.0.0's reduce mutates the accumulator struct in place (a 'b'
    // expression reading a.l sees the freshly-written new l when the
    // transform range is column-bound), while a recursive step can only
    // see prior-row columns. Same three multiplies in the same order as
    // the Spark UDF's expanded trend spelling.
    "event_holt" ->
      """WITH RECURSIVE s AS (SELECT user_id,
        |    LIST(value ORDER BY ts, event_id) AS vals,
        |    LIST(event_id ORDER BY ts, event_id) AS eids
        |  FROM events GROUP BY user_id),
        |h AS (
        |  SELECT user_id, 1 AS i, vals, eids,
        |    vals[1] AS l, CAST(0.0 AS DOUBLE) AS b
        |  FROM s
        |  UNION ALL
        |  SELECT user_id, i + 1, vals, eids,
        |    0.5 * vals[i + 1] + 0.5 * (l + b),
        |    0.25 * vals[i + 1] - 0.25 * l + 0.75 * b
        |  FROM h WHERE i < LEN(vals))
        |SELECT eids[i] AS event_id, user_id, vals[i] AS value,
        | CAST(FLOOR(l * 10000 + 0.5) AS BIGINT) AS level_bp,
        | CAST(FLOOR(b * 10000 + 0.5) AS BIGINT) AS trend_bp,
        | CAST(FLOOR((l + b) * 10000 + 0.5) AS BIGINT) AS forecast_bp
        |FROM h ORDER BY event_id""".stripMargin,

    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |t AS (SELECT event_type AS from_type,
        |        LEAD(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, COUNT(*) AS n FROM t
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin)

  /**
   * Batch EWMA fold (α = 0.5), the oracle-checkable exact arm of the
   * EWMA pair (scale arm: [[StreamPipelines.statefulEwma]]). Collects
   * each key's ordered events EXECUTOR-side (one task holds one key's
   * array — per-task memory is O(events-per-hottest-key), ~48 B/event;
   * the hot-key property test drives 200 k events through one user) and
   * prefix-folds it with [[ewmaPrefix]]; α = 0.5 keeps every multiply
   * binary-exact so Spark's and DuckDB's folds agree bit-for-bit. The
   * OUTPUT is integer basis points via the shared floor(x·10⁴ + 0.5)
   * formula — engine round() implementations disagree exactly at the
   * x.xxxx5 boundaries this α generates (Spark rounds the shortest
   * decimal repr, DuckDB the raw binary), so neither engine's round()
   * is used. One shuffle by user, nothing driver-side.
   */
  def ewmaBatch(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .withColumn("ew", ewmaPrefix(expr("transform(evs, e -> e.value)")))
      .select(col("user_id"), posexplode(expr(
        "transform(evs, (e, i) -> struct(e.event_id AS eid, e.value AS v, ew[i] AS ew))")))
      .select(col("col.eid").as("event_id"), col("user_id"),
        col("col.v").as("value"),
        floor(col("col.ew") * 10000 + 0.5).cast("long").as("ewma_bp"))

  /**
   * O(n) EWMA prefix scan over one key's ordered values. A UDF on
   * purpose (the one place the functions-over-UDFs rule inverts): the
   * Catalyst spelling — `aggregate(..., acc || array(step))` — copies
   * the accumulated array EVERY step, O(n²) work per key that turns a
   * 200 k-event hot key into ~2·10¹⁰ element copies inside one task. A
   * sequential in-place fold is O(n), and the arithmetic is the same
   * two multiplies + one add per step in the same order
   * (`0.5·v + 0.5·prev`, IEEE-deterministic), so the oracle
   * hash-parity with DuckDB's LIST_REDUCE is unchanged.
   */
  private val ewmaPrefix =
    org.apache.spark.sql.functions.udf { (vals: Seq[Double]) =>
      var prev = 0.0
      var first = true
      vals.map { v =>
        val e = if (first) { first = false; v } else 0.5 * v + 0.5 * prev
        prev = e
        e
      }
    }

  /** Batch Holt fold (α = β = 0.5) — [[ewmaBatch]]'s level+trend twin.
    * Init l₁ = v₁, b₁ = 0; then l = 0.5·v + 0.5·(l' + b'),
    * b = 0.5·(l − l') + 0.5·b'. Same memory/scale contract as
    * ewmaBatch; the DuckDB oracle folds the SAME spelled expressions
    * over a struct accumulator, so parity is bit-exact. */
  def holtBatch(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .withColumn("hw", holtPrefix(expr("transform(evs, e -> e.value)")))
      .select(col("user_id"), posexplode(expr(
        "transform(evs, (e, i) -> struct(e.event_id AS eid, e.value AS v, " +
          "hw[i]._1 AS l, hw[i]._2 AS b))")))
      .select(col("col.eid").as("event_id"), col("user_id"),
        col("col.v").as("value"),
        floor(col("col.l") * 10000 + 0.5).cast("long").as("level_bp"),
        floor(col("col.b") * 10000 + 0.5).cast("long").as("trend_bp"),
        floor((col("col.l") + col("col.b")) * 10000 + 0.5).cast("long")
          .as("forecast_bp"))

  /** O(n) Holt prefix scan — a UDF for the same O(n)-vs-O(n²) reason
    * as [[ewmaPrefix]]. The trend uses the EXPANDED spelling
    * 0.25·v − 0.25·l' + 0.75·b' (algebraically 0.5·(l − l') + 0.5·b'
    * with the new-l substituted): the DuckDB oracle cannot evaluate the
    * nested form — its 1.0.0 list_reduce mutates the accumulator
    * struct field-by-field, so a 'b' expression referencing a.l reads
    * the freshly-written NEW l when the transform range is
    * column-bound — and the recursive-CTE oracle must reference only
    * prior-row columns anyway. Both engines run the same three
    * multiplies in the same order, so parity stays bit-exact. */
  private val holtPrefix =
    org.apache.spark.sql.functions.udf { (vals: Seq[Double]) =>
      var pl = 0.0
      var pb = 0.0
      var first = true
      vals.map { v =>
        val l = if (first) v else 0.5 * v + 0.5 * (pl + pb)
        val b = if (first) { first = false; 0.0 }
                else 0.25 * v - 0.25 * pl + 0.75 * pb
        pl = l
        pb = b
        (l, b)
      }
    }
}
