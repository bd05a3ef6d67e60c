package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** Event-time windowing over the `events` stream.
  *
  * The same `window()` / `session_window()` aggregations run in BOTH batch
  * and Structured Streaming — the batch forms back the driver's DuckDB
  * oracle, the streaming forms add a watermark and run incrementally
  * (tested with a file source + memory sink in StreamingSpec). The
  * reference has no streaming at all (SURVEY.md §2.10) — this is the
  * greenfield Spark-native design: tumbling windows shuffle once on
  * (window, event_type); session windows use Spark's built-in
  * session-merge state store keyed by user.
  */
object EventStream {

  /** Tumbling event-time window aggregate (batch form). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows with an inactivity gap, per user (batch form).
    * A new session starts when an event arrives >= gap after the previous
    * one. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming form of [[tumbling]] with a watermark, writing to a named
    * memory sink. Late data beyond the watermark is dropped — the
    * standard at-scale configuration for unbounded sources. */
  def tumblingStream(spark: SparkSession, sourceDir: String,
      queryName: String, width: String = "1 hour",
      watermark: String = "2 hours"): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("sum_value"))
    stream.writeStream.outputMode("complete")
      .format("memory").queryName(queryName).start()
  }

  /** Stream-static dimension enrichment (batch form): broadcast-join a
    * static dimension onto events, then a tumbling aggregate per dim
    * attribute — the standard enrichment step of an event pipeline. */
  def enriched(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, dimAttr: String, width: String = "1 hour")
      : DataFrame = {
    // rename the dim side first: a same-named key (the common case for
    // dimension joins) would make col(eventKey) === col(dimKey) ambiguous
    val d = dim.select(col(dimKey).as("__dim_key"),
      col(dimAttr).as("__dim_attr"))
    events.join(broadcast(d), col(eventKey) === col("__dim_key"))
      .groupBy(window(col("ts"), width), col("__dim_attr"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"),
        col("__dim_attr").as(dimAttr), col("n_events"), col("sum_value"))
  }

  /** Streaming form of [[enriched]] (the SAME plan-building code over a
    * watermarked streaming source): a stream-static join needs NO join
    * state — the dimension is broadcast into every micro-batch (the
    * at-scale configuration for slowly-changing dims: republish the dim,
    * not the stream). Watermarked tumbling aggregate in APPEND mode, so
    * the watermark both finalizes windows and EVICTS their aggregation
    * state — total state is bounded by (windows inside the watermark
    * horizon) × (dim attrs), never by stream lifetime. Windows newer
    * than the horizon emit once the watermark passes them. */
  def enrichedStream(spark: SparkSession, sourceDir: String,
      dim: DataFrame, queryName: String, eventKey: String,
      dimKey: String, dimAttr: String, width: String = "1 hour",
      watermark: String = "2 hours"): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = enriched(
      spark.readStream.schema(schema).parquet(sourceDir)
        .withWatermark("ts", watermark),
      dim, eventKey, dimKey, dimAttr, width)
    stream.writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
  }

  /** Interval (event-time range) join — the attribution primitive: each
    * `leftType` event pairs with the SAME user's `rightType` events in
    * `(ts, ts + horizon]`. The range rides an equi-join on user_id —
    * one shuffle per side, never a cross product — so the batch form
    * scales like any keyed join. [[intervalJoinStream]] is the
    * streaming form of the same plan.
    *
    * Hot-key guard (`salts > 1`): at 100 TB a single celebrity user_id
    * lands ALL its rows from both sides in one partition pair — one
    * straggler task doing O(hot_views × hot_clicks) work. With salting,
    * the left side scatters across `salts` sub-keys (hash of its event
    * id) and the right side replicates once per salt, so the hot key's
    * work spreads over `salts` tasks at the cost of a ×salts blowup of
    * the (filtered, narrow) right side — the standard space-for-skew
    * trade. Each (view, click) pair still meets exactly once, in the one
    * partition owning the view's salt, so results are identical for
    * inner AND left_outer (each view keeps exactly one salt). For batch
    * plans AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
    * on by default) already mitigates sort-merge skew at runtime;
    * explicit salting is the deterministic bound, and the option that
    * still works where AQE cannot run (stateful streaming). */
  def intervalJoin(events: DataFrame, leftType: String = "view",
      rightType: String = "click", horizon: String = "12 hours",
      joinType: String = "inner", salts: Int = 1): DataFrame = {
    // salting replicates the RIGHT side once per salt, which is only
    // result-preserving when unmatched right rows are never emitted — a
    // right_outer/full join would emit each unmatched right row `salts`
    // times. Fail loudly instead of multiplying rows.
    require(salts <= 1 || joinType == "inner" || joinType == "left_outer",
      s"intervalJoin salting supports inner/left_outer only, got $joinType")
    joinPairs(shapeLeft(events, leftType, salts),
      shapeRight(events, rightType, salts), horizon, joinType, salts)
  }

  private def shapeLeft(df: DataFrame, t: String, salts: Int = 1): DataFrame = {
    val base = df.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    if (salts <= 1) base
    else base.withColumn("__salt",
      pmod(xxhash64(col("view_id")), lit(salts.toLong)))
  }

  // rename the key: both sides come from the same source, so a shared
  // user_id column would make the join condition ambiguous
  private def shapeRight(df: DataFrame, t: String, salts: Int = 1): DataFrame = {
    val base = df.filter(col("event_type") === t)
      .select(col("user_id").as("__r_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    if (salts <= 1) base
    else base.withColumn("__r_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
  }

  // "left_outer" keeps unmatched left events with null right fields —
  // the conversion-attribution shape (views that never converted)
  private def joinPairs(v: DataFrame, c: DataFrame, horizon: String,
      joinType: String = "inner", salts: Int = 1): DataFrame = {
    val keyCond = col("user_id") === col("__r_user") &&
      (if (salts <= 1) lit(true) else col("__salt") === col("__r_salt"))
    v.join(c, keyCond &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("click_id"), col("click_ts"), col("click_value"))
  }

  /** Stream-stream form of [[intervalJoin]] (the canonical watermarked
    * stream-stream join, built by the SAME plan code): both sides carry
    * a watermark and the join condition bounds each side's event time
    * relative to the other, so Spark derives a state-retention bound of
    * ~(watermark + horizon) per side — join state holds a horizon's
    * worth of events, never the stream's lifetime. Append mode: inner
    * matches emit when found; `left_outer` null-rows emit once the
    * watermark proves no match can still arrive. */
  def intervalJoinStream(spark: SparkSession, sourceDir: String,
      queryName: String, leftType: String = "view",
      rightType: String = "click", horizon: String = "12 hours",
      watermark: String = "1 hour", joinType: String = "inner")
      : StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    def src = spark.readStream.schema(schema).parquet(sourceDir)
    val v = shapeLeft(src, leftType).withWatermark("view_ts", watermark)
    val c = shapeRight(src, rightType).withWatermark("click_ts", watermark)
    joinPairs(v, c, horizon, joinType).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
  }

  /** Streaming exact-dedup — the unbounded-ingest counterpart of
    * [[graft.dedup.Dedup.exactGroups]]: keep the first arrival per key
    * (e.g. a content fingerprint), with state BOUNDED by the watermark
    * (`dropDuplicatesWithinWatermark`) so the state store holds one entry
    * per key per watermark horizon, not per all-time key. The config for
    * a 100 TB/day dedup ingest: state scales with the dedup horizon. */
  def dedupStream(spark: SparkSession, sourceDir: String, queryName: String,
      keyCols: Seq[String], watermark: String = "2 hours"): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
  }

  /** COMPLETED sessions via `flatMapGroupsWithState` with an event-time
    * timeout — the custom-state form of sessionization: the built-in
    * `session_window` (see [[sessions]]) can only emit when aggregation
    * finalizes, whereas custom state lets a session carry arbitrary
    * payload and emit EXACTLY when the watermark passes its gap. State is
    * one open session per user; an event within `gapMs` extends it, a
    * later event closes it (emitting the finished session) and opens the
    * next; the timeout emits the final session once the watermark passes
    * last + gap. State size: one small struct per ACTIVE user. */
  def completedSessionsStream(spark: SparkSession, sourceDir: String,
      queryName: String, gapMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): StreamingQuery = {
    import spark.implicits._
    val schema = spark.read.parquet(sourceDir).schema
    val out = spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((user, s.start, s.n, s.sum))
          } else {
            val sorted = rows.map(r => (r._2.getTime, r._3)).toArray.sortBy(_._1)
            var open = state.getOption
            val closed = Seq.newBuilder[(Long, Long, Long, Double)]
            for ((t, v) <- sorted) open match {
              case Some(s) if t - s.last <= gapMs =>
                open = Some(OpenSession(s.start, t, s.n + 1, s.sum + v))
              case Some(s) =>
                closed += ((user, s.start, s.n, s.sum))
                open = Some(OpenSession(t, t, 1L, v))
              case None =>
                open = Some(OpenSession(t, t, 1L, v))
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
      .toDF("user_id", "session_start", "n_events", "sum_value")
    out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
  }

  /** Running per-user totals via custom state
    * (`KeyValueGroupedDataset.mapGroupsWithState`) — the pattern for
    * stateful logic Spark's built-in windows can't express. State is one
    * small struct per user in the state store; scales with distinct
    * users, not events. */
  def statefulUserTotals(spark: SparkSession, sourceDir: String,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    val schema = spark.read.parquet(sourceDir).schema
    val updated = spark.readStream.schema(schema).parquet(sourceDir)
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(0L, 0.0))
          var n = prev.n; var s = prev.sum
          rows.foreach { r => n += 1; s += r._2 }
          val next = UserTotals(n, s)
          state.update(next)
          (user, next.n, next.sum)
      }
      .toDF("user_id", "n_events", "sum_value")
    updated.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName).start()
  }
}

case class UserTotals(n: Long, sum: Double)

/** Open-session state for [[EventStream.completedSessionsStream]]
  * (epoch-millis bounds). */
case class OpenSession(start: Long, last: Long, n: Long, sum: Double)
