package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Event-time windowing queries over the `events` table (SURVEY.md §2.10
  * / §7.6). The batch forms of the SAME aggregations that run under
  * Structured Streaming (see EventStream / StreamingSpec); the DuckDB
  * oracles replicate tumbling windows with time_bucket and session
  * windows with the lag-gap cumulative-sum construction.
  */
object QueriesStream {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  /** Schema-adaptive events ingestion — see [[graft.sources.Events]]:
    * `ts` normalizes to TimestampType whether the parquet stores
    * TIMESTAMP(NANOS) (read as long under nanosAsLong), timestamp[us],
    * or timestamp[us] NTZ (the driver's current layout). Window starts
    * are emitted as epoch-microsecond longs on both sides; the DuckDB
    * oracle's `CAST(ts AS TIMESTAMP)` normalizes identically. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    graft.sources.Events.load(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_window" -> ((s, dir) => {
      EventStream.tumbling(ev(s, dir), "1 hour")
        .select(unix_micros(col("ws")).as("ws"), col("event_type"),
          col("n_events"), round(col("sum_value"), 4).as("sum_value"))
    }),

    // As-of join: each click event picks up the value of the user's most
    // recent purchase at-or-before it (union+window, single exchange).
    "q_asof" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.asof(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("last_purchase_value"))
    }),

    // Hot-key-safe as-of join (time-bucketed two-pass carry-forward):
    // identical semantics and oracle as q_asof, heavy pass partitioned
    // by (user_id, day) so a celebrity user can never serialize one task
    "q_asof_bucketed" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.asofBucketed(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"), "1 day")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("last_purchase_value"))
    }),

    // Interval join: each view pairs with the same user's clicks within
    // the next 12 hours (equi-join on user_id carrying the range — the
    // attribution primitive; stream-stream form in EventStream)
    "q_interval_join" -> ((s, dir) => {
      EventStream.intervalJoin(ev(s, dir), "view", "click", "12 hours")
        .select(col("user_id"), col("view_id"),
          unix_micros(col("view_ts")).as("view_ts"),
          col("click_id"), unix_micros(col("click_ts")).as("click_ts"),
          round(col("click_value"), 4).as("click_value"))
    }),

    // Left-outer variant: unconverted views survive with null click
    // fields — the conversion-rate numerator/denominator in one pass
    "q_interval_left" -> ((s, dir) => {
      EventStream.intervalJoin(ev(s, dir), "view", "click", "12 hours",
        "left_outer")
        .select(col("user_id"), col("view_id"),
          unix_micros(col("view_ts")).as("view_ts"),
          col("click_id"), unix_micros(col("click_ts")).as("click_ts"),
          round(col("click_value"), 4).as("click_value"))
    }),

    "q_sessionize" -> ((s, dir) => {
      EventStream.sessions(ev(s, dir), "30 minutes")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start"),
          col("n_events"), round(col("sum_value"), 4).as("sum_value"))
    })
  )

  private val evCte =
    "WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, " +
      "value, user_id FROM events)"

  val oracleSql: Map[String, String] = Map(
    "q_event_window" ->
      s"""$evCte
         |SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws,
         | event_type, count(*) AS n_events,
         | round(sum(value), 4) AS sum_value
         |FROM e GROUP BY 1, 2""".stripMargin,
    "q_asof" ->
      s"""$evCte
         |SELECT c.event_id, c.user_id,
         |  round(p.value, 4) AS last_purchase_value
         |FROM (SELECT event_id, user_id, ts FROM e
         |      WHERE event_type = 'click') c
         |ASOF LEFT JOIN (SELECT user_id, ts, value FROM e
         |      WHERE event_type = 'purchase') p
         |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    // the bucketed variant computes the SAME join — one oracle pins both
    "q_asof_bucketed" ->
      s"""$evCte
         |SELECT c.event_id, c.user_id,
         |  round(p.value, 4) AS last_purchase_value
         |FROM (SELECT event_id, user_id, ts FROM e
         |      WHERE event_type = 'click') c
         |ASOF LEFT JOIN (SELECT user_id, ts, value FROM e
         |      WHERE event_type = 'purchase') p
         |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q_interval_join" ->
      s"""$evCte
         |SELECT v.user_id, v.event_id AS view_id,
         |  epoch_us(v.ts) AS view_ts,
         |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts,
         |  round(c.value, 4) AS click_value
         |FROM (SELECT * FROM e WHERE event_type = 'view') v
         |JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON v.user_id = c.user_id AND c.ts > v.ts
         | AND c.ts <= v.ts + INTERVAL '12 hours'""".stripMargin,
    "q_interval_left" ->
      s"""$evCte
         |SELECT v.user_id, v.event_id AS view_id,
         |  epoch_us(v.ts) AS view_ts,
         |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts,
         |  round(c.value, 4) AS click_value
         |FROM (SELECT * FROM e WHERE event_type = 'view') v
         |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON v.user_id = c.user_id AND c.ts > v.ts
         | AND c.ts <= v.ts + INTERVAL '12 hours'""".stripMargin,
    // Spark session_window semantics: an event < gap after the previous
    // one extends the session; exactly-gap starts a new one (hence >=).
    "q_sessionize" ->
      s"""$evCte, g AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |           >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
         |  FROM e),
         |s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g)
         |SELECT user_id, epoch_us(min(ts)) AS session_start,
         |  count(*) AS n_events, round(sum(value), 4) AS sum_value
         |FROM s GROUP BY user_id, sid""".stripMargin
  )
}
