package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive ingestion for the `events` table (SURVEY.md §2.10).
  *
  * Parquet writers disagree on how to store event timestamps — the three
  * layouts seen in the wild (and in this project's own test fixtures over
  * time) are:
  *
  *   - `TIMESTAMP(NANOS)`: Spark cannot read it natively; sessions set
  *     `spark.sql.legacy.parquet.nanosAsLong` and the column arrives as
  *     a `LongType` of epoch-nanoseconds. Floor-truncated to microseconds
  *     here (DuckDB's TIMESTAMP_NS → TIMESTAMP cast truncates identically).
  *   - `timestamp[us]` with `isAdjustedToUTC=true`: read as `TimestampType`
  *     — passed through unchanged.
  *   - `timestamp[us]` without UTC adjustment (pyarrow/pandas' default):
  *     read as `TimestampNTZType`; cast to `TimestampType`, which under the
  *     project-wide `spark.sql.session.timeZone=UTC` maps wall time to the
  *     identical epoch microseconds DuckDB's `CAST(ts AS TIMESTAMP)` +
  *     `epoch_us` sees. (In a non-UTC session the cast interprets the wall
  *     time in the session zone — Spark's own NTZ semantics.)
  *
  * Every downstream event-time operator ([[graft.streaming.EventStream]],
  * [[graft.operators.AsOfJoin]], the q_event_* queries and their tests)
  * ingests through this one function, so a layout change in the data is a
  * no-op instead of an analysis-time `DATATYPE_MISMATCH` across the whole
  * event family. No reference analog — the reference has no event-time
  * component at all; this is engine robustness of the kind Spark itself
  * provides via type coercion.
  */
object Events {

  /** Read `dir`/events.parquet and normalize `ts` to `TimestampType`. */
  def load(spark: SparkSession, dir: String): DataFrame =
    adapt(spark.read.parquet(s"$dir/events.parquet"))

  /** Normalize an already-read events frame: `ts` becomes `TimestampType`
    * (microsecond instants) regardless of the physical layout it was
    * stored in. */
  def adapt(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType => // TIMESTAMP(NANOS) read under nanosAsLong
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampType => raw
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"events.ts: expected LONG (nanos), TIMESTAMP or TIMESTAMP_NTZ, got $other")
  }
}
