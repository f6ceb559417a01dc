package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Event-time window operators — batch twins of the streaming surface
  * (SURVEY §2B B47–B49, B55). The same aggregations run as genuine
  * Structured Streaming queries in [[graft.streaming.StreamOps]]; the
  * batch↔streaming equivalence is asserted in ScalaTest, and the batch
  * side is DuckDB-oracled here (two-hop verification).
  */
object EventOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B47 tumbling window — BENCH headline q_tumbling_window.
    "q_tumbling_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    }),

    // B48 sliding window (1h length, 15min slide => 4 windows per event).
    "q_sliding_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("ws"), col("n"), col("n_users"))
        .orderBy("ws")
    }),

    // B49 session window (10 min gap) per user. Oracle: gaps-and-islands.
    "q_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // B55 stream–static join twin: events × broadcast literal dim.
    "q_stream_static_join" -> ((s, dir) => {
      val weights = s.createDataFrame(Seq(
        ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
        ("signup", 5.0), ("error", 0.0))).toDF("event_type", "weight")
      Tables.events(s, dir)
        .join(broadcast(weights), Seq("event_type"))
        .groupBy("event_type")
        .agg(round(sum(col("value") * col("weight")), 4).as("weighted_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        | time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS we,
        | event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,

    "q_sliding_window" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) - k.k*INTERVAL '15 minutes' AS ws,
        | count(*) AS n, count(DISTINCT user_id) AS n_users
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

    "q_stream_static_join" ->
      """SELECT e.event_type,
        | round(sum(e.value * w.weight),4) AS weighted_value,
        | count(*) AS n
        |FROM events e
        |JOIN (VALUES ('click',1.0),('view',0.5),('purchase',10.0),('signup',5.0),('error',0.0)) w(event_type, weight)
        |  ON e.event_type = w.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
  )
}
