package graft.queries

import graft.Q
import graft.io.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Event-time window operators — batch twins of the streaming surface
  * (SURVEY §2B B47–B49, B55). Each query applies the EXACT transform from
  * [[graft.streaming.StreamOps]] that the streaming queries use (shared
  * code, shared logical plan); StreamingSpec asserts batch≡streaming and
  * the batch side is DuckDB-oracled here — two-hop verification.
  */
object EventOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B47 tumbling window — BENCH headline q_tumbling_window.
    "q_tumbling_window" -> ((s, dir) =>
      StreamOps.tumblingAgg(Tables.events(s, dir)).orderBy("ws", "event_type")),

    // B48 sliding window (1h length, 15min slide => 4 windows per event).
    "q_sliding_window" -> ((s, dir) =>
      StreamOps.slidingAgg(Tables.events(s, dir)).orderBy("ws")),

    // B49 session window (10 min gap) per user. Oracle: gaps-and-islands.
    "q_session_window" -> ((s, dir) =>
      StreamOps.sessionAgg(Tables.events(s, dir)).orderBy("user_id", "session_start")),

    // B55 stream–static join twin: events × broadcast literal dim.
    "q_stream_static_join" -> ((s, dir) =>
      StreamOps.weightedByType(s, Tables.events(s, dir)).orderBy("event_type")),

    // B4+B47+B50+B51 REAL streaming run (readStream → watermark → dedup →
    // tumbling agg → AvailableNow → foreachBatch parquet), not a batch
    // twin: the harness observes the streaming engine end-to-end.
    "q_streaming_pipeline" -> ((s, dir) => StreamOps.tumblingPipeline(s, dir)),

    // B49+B50 real streaming session windows, append mode.
    "q_streaming_sessions" -> ((s, dir) => StreamOps.sessionPipeline(s, dir)),

    // B25 real stream–stream interval join (clicks ⋈ purchases within
    // 1h per user), run to completion and exactly equal to the batch
    // join — see StreamOps.joinPipeline.
    "q_streaming_join" -> ((s, dir) => StreamOps.joinPipeline(s, dir)),

    // B112 on a stream: the expectations gate as a REAL streaming ingest
    // sink — each micro-batch split once into clean/quarantine tables
    // (idempotent per-batch-dir sink). The harness aggregates both
    // dispositions; the oracle restates the gate as one boolean over the
    // batch fixture (null predicate = violation on both sides).
    "q_streaming_gate" -> ((s, dir) => {
      import graft.ops.Expect
      val rules = Seq(
        Expect.rule("business_hours", hour(col("ts")).between(8, 17)),
        Expect.rule("k_in_range",
          get_json_object(col("props"), "$.k").cast("int") <= 50),
        Expect.rule("not_error", col("event_type") =!= "error"),
        Expect.rule("value_capped", col("value") <= 250))
      val (clean, bad) = StreamOps.gatedRun(s, dir, rules)
      clean.select(lit("clean").as("disposition"), col("event_type"))
        .unionByName(
          bad.select(lit("quarantined").as("disposition"), col("event_type")))
        .groupBy("disposition", "event_type")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("disposition", "event_type")
    }),

    // Session path mining: per 10-minute-gap session, the ordered
    // event-type sequence becomes a path string; paths are counted and
    // the top 20 reported — the journey-analysis pass product analytics
    // runs. Reuses the gaps-and-islands sessionization (lag + cumulative
    // sum), then one agg per session and one per path. Paths are capped
    // at the first `maxPathEvents` events per session (see
    // [[sessionPaths]]) so a runaway bot session stays a bounded row.
    "q_event_paths" -> ((s, dir) =>
      sessionPaths(Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))),

    // Retention cohorts: users grouped by first-seen week, activity
    // tracked per week offset — the product-analytics staple. Two
    // shuffles (first-seen agg on user, cohort-cell agg), both keyed.
    "q_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val first = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      ev.join(first, "user_id")
        .withColumn("week_offset",
          datediff(to_date(col("wk")), to_date(col("cohort"))) / 7)
        .groupBy(col("cohort"), col("week_offset").cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort", "week_offset")
    }),

    // Impossible-travel detection (fraud/abuse staple): consecutive
    // events per user get haversine distance over event-derived
    // deterministic coordinates (the fixture has no geo columns);
    // speed > 500 km/h between events flags the pair. Exercises the
    // trig surface (radians/sin/cos/asin/sqrt) + lag windows; one
    // shuffle on user_id.
    "q_impossible_travel" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val lat = (col("event_id") * 37 % 17000) / lit(100.0) - 85.0
      val lon = (col("event_id") * 73 % 36000) / lit(100.0) - 180.0
      def hav(x: org.apache.spark.sql.Column) = pow(sin(radians(x) / 2), 2)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          lat.as("lat"), lon.as("lon"))
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .withColumn("pts", lag(col("ts"), 1).over(w))
        .filter(col("pts").isNotNull)
      val distKm = lit(2 * 6371.0) * asin(sqrt(
        hav(col("lat") - col("plat")) +
          cos(radians(col("plat"))) * cos(radians(col("lat"))) *
          hav(col("lon") - col("plon"))))
      val hours = (unix_micros(col("ts")) - unix_micros(col("pts"))) / lit(3600e6)
      ev.withColumn("dist_km", distKm).withColumn("hours", hours)
        .filter(col("hours") > 0.01 && col("dist_km") / col("hours") > 500)
        .select(col("user_id"), col("event_id"),
          round(col("dist_km"), 2).as("dist_km"),
          round(col("hours"), 4).as("hours"))
        .orderBy("user_id", "event_id")
    }),

    // Anomaly detection: per-event-type z-score of `value`; flag events
    // beyond 2.5 sigma. Two window functions over ONE partitioning (one
    // shuffle on event_type); no collect, no second pass over the data.
    "q_zscore_outliers" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      Tables.events(s, dir)
        .withColumn("z", (col("value") - avg("value").over(w)) /
          stddev_samp(col("value")).over(w))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), round(col("z"), 4).as("z"))
        .orderBy("event_id")
    }),

    // B39 time-based frame: rolling 1-hour count/sum per user via a
    // RANGE BETWEEN INTERVAL frame — the batch twin of a sliding
    // stream aggregation, one shuffle on user_id. RANGE (not ROWS)
    // makes tied timestamps peers, so the result is deterministic.
    "q_rolling_1h" -> ((s, dir) => {
      val frame = "OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n_1h", expr(s"count(*) $frame"))
        .withColumn("sum_1h", expr(s"round(sum(value) $frame, 4)"))
        .select("event_id", "user_id", "n_1h", "sum_1h")
        .orderBy("event_id")
    }),

    // SCD2 history construction (the CDC-side of a warehouse load):
    // each per-user event becomes a validity interval
    // [ts, next_ts) via lead(); the open interval is the current row.
    // One shuffle on user_id; interval assembly is pure window work.
    "q_scd2_intervals" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // B154 incremental SCD2 maintenance (APPLY CHANGES): the dimension
    // is built from events BEFORE 2024-01-08, the later events apply as
    // a change batch — and the oracle is the FULL-history recompute
    // (identical SQL to q_scd2_intervals), so the hash match proves
    // incremental apply ≡ rebuilding from scratch: closed currents,
    // intermediate versions, new currents, untouched keys, all of it.
    "q_scd2_apply" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
      val cut = lit("2024-01-08").cast("timestamp")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val dim = ev.filter(col("ts") < cut)
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .drop("ts")
      graft.ops.Scd.applyChanges(dim, ev.filter(col("ts") >= cut),
          "user_id", "ts", "event_id")
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // Time-decayed engagement score: recent events count more, with a
    // 7-day exponential half-life-ish decay anchored at the corpus max
    // timestamp. The anchor is a 1-row broadcast (no window over the
    // whole table); age math stays on exact integer microseconds so both
    // engines see identical doubles.
    "q_time_decay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(max(unix_micros(col("ts"))).as("mx"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("decay",
          exp((unix_micros(col("ts")) - col("mx")).cast("double") / 86400e6 / lit(7.0)))
        .groupBy("user_id")
        .agg(round(sum(col("value") * col("decay")), 4).as("decayed_value"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),
  )

  /** Top-K session journey paths with a hard per-session event cap.
    *
    * The cap is applied BEFORE the per-session collect: a row-number
    * filter keeps only each session's first `maxPathEvents` events, so
    * both the aggregation payload and the final path row are bounded —
    * a million-event bot session contributes `maxPathEvents` rows, never
    * one giant array in one task. The second window (user_id, sid) needs
    * no extra shuffle: HashPartitioning(user_id) already satisfies its
    * clustering requirement (subset rule), it only adds a local sort.
    * The "top journey prefixes" meaning survives the cap.
    */
  def sessionPaths(events: org.apache.spark.sql.DataFrame, gapMinutes: Int = 10,
      maxPathEvents: Int = 50, topK: Int = 20): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = events
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            >= gapMinutes * 60L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val wSess = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sid").orderBy("ts", "event_id")
    sessions
      .withColumn("k", row_number().over(wSess))
      .filter(col("k") <= maxPathEvents)
      .groupBy("user_id", "sid")
      .agg(concat_ws(">", transform(
        sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        x => x.getField("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(topK)
  }

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        | time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS we,
        | event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,

    "q_sliding_window" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) - k.k*INTERVAL '15 minutes' AS ws,
        | count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
        |GROUP BY 1 ORDER BY ws""".stripMargin,

    // New session when the gap since the previous event is >= 10 minutes
    // (Spark's session end = last_ts + gap is exclusive).
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), numbered AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL '10 minutes' AS session_end,
        | count(*) AS n_events
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // Append-mode semantics under a 0s watermark: only windows whose end
    // has been passed by the final watermark (= max ts) are emitted; the
    // in-flight tail window is correctly withheld. The oracle mirrors the
    // streaming dedup with DISTINCT ON (event_id): a no-op while the
    // fixture's event_ids are unique, and still aligned with Spark's
    // keep-one-per-key if the fixture ever gains exact-duplicate rows
    // (only non-identical rows sharing an event_id — a fixture bug —
    // would make the two picks diverge).
    "q_streaming_pipeline" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        | time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS we,
        | event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id)
        |GROUP BY 1, 2, 3
        |HAVING we <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
        |ORDER BY ws, event_type""".stripMargin,

    "q_streaming_sessions" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), numbered AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL '10 minutes' AS session_end,
        | count(*) AS n_events
        |FROM numbered
        |GROUP BY user_id, sid
        |HAVING session_end <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
        |ORDER BY user_id, session_start""".stripMargin,

    "q_stream_static_join" ->
      """SELECT e.event_type,
        | round(sum(e.value * w.weight),4) AS weighted_value,
        | count(*) AS n
        |FROM events e
        |JOIN (VALUES ('click',1.0),('view',0.5),('purchase',10.0),('signup',5.0),('error',0.0)) w(event_type, weight)
        |  ON e.event_type = w.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // Inner interval join: the streaming run emits exactly the batch
    // matches (watermarks only bound state retention, never drop inner
    // matches on bounded input).
    "q_streaming_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        | CAST(c.ts AS TIMESTAMP) AS c_ts, CAST(p.ts AS TIMESTAMP) AS p_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '1 hour'
        |ORDER BY click_id, purchase_id""".stripMargin,

    // The gate restated as one boolean per row over the batch fixture:
    // clean ⇔ every rule passes with null counted as failure.
    "q_streaming_gate" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (coalesce(hour(CAST(ts AS TIMESTAMP)) BETWEEN 8 AND 17, false)
        |     AND coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER) <= 50, false)
        |     AND coalesce(event_type <> 'error', false)
        |     AND coalesce(value <= 250, false)) AS ok
        |  FROM events)
        |SELECT CASE WHEN ok THEN 'clean' ELSE 'quarantined' END AS disposition,
        |       event_type, count(*) AS n_rows
        |FROM e
        |GROUP BY 1, 2
        |ORDER BY disposition, event_type""".stripMargin,

    "q_rolling_1h" ->
      """SELECT event_id, user_id,
        | count(*) OVER w AS n_1h,
        | round(sum(value) OVER w, 4) AS sum_1h
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // deliberately the SAME SQL as q_scd2_intervals: the Spark side does
    // split-build + incremental apply, the oracle rebuilds history from
    // everything — hash equality IS the incremental-correctness proof
    "q_scd2_apply" ->
      """SELECT user_id, event_id,
        | CAST(ts AS TIMESTAMP) AS valid_from,
        | lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
        | lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_scd2_intervals" ->
      """SELECT user_id, event_id,
        | CAST(ts AS TIMESTAMP) AS valid_from,
        | lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
        | lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_event_paths" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |capped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id) AS k
        |    FROM numbered) WHERE k <= 50),
        |paths AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM capped GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions
        |FROM paths GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        |  FROM events),
        |first AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
        | CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(e.wk AS DATE)) // 7 AS INTEGER) AS week_offset,
        | count(DISTINCT e.user_id) AS active_users
        |FROM ev e JOIN first f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,

    "q_impossible_travel" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    (event_id * 37 % 17000) / 100.0 - 85.0 AS lat,
        |    (event_id * 73 % 36000) / 100.0 - 180.0 AS lon
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, ts, lat, lon,
        |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
        |    lag(ts) OVER w AS pts
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |scored AS (
        |  SELECT user_id, event_id,
        |    2 * 6371.0 * asin(sqrt(
        |      pow(sin(radians(lat - plat) / 2), 2) +
        |      cos(radians(plat)) * cos(radians(lat)) *
        |      pow(sin(radians(lon - plon) / 2), 2))) AS dist_km,
        |    CAST(epoch_us(ts) - epoch_us(pts) AS DOUBLE) / 3600e6 AS hours
        |  FROM lagged WHERE pts IS NOT NULL)
        |SELECT user_id, event_id,
        | round(dist_km, 2) AS dist_km, round(hours, 4) AS hours
        |FROM scored
        |WHERE hours > 0.01 AND dist_km / hours > 500
        |ORDER BY user_id, event_id""".stripMargin,

    "q_zscore_outliers" ->
      """SELECT event_id, event_type, round(z, 4) AS z FROM (
        |  SELECT event_id, event_type,
        |    (value - avg(value) OVER (PARTITION BY event_type)) /
        |      stddev_samp(value) OVER (PARTITION BY event_type) AS z
        |  FROM events) t
        |WHERE abs(z) > 2.5 ORDER BY event_id""".stripMargin,

    "q_time_decay" ->
      """WITH anchor AS (
        |  SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS mx FROM events)
        |SELECT user_id,
        | round(sum(value * exp(
        |   CAST(epoch_us(CAST(ts AS TIMESTAMP)) - mx AS DOUBLE) / 86400e6 / 7.0)), 4)
        |   AS decayed_value,
        | count(*) AS n_events
        |FROM events CROSS JOIN anchor
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
