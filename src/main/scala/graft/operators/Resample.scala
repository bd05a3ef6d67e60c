package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar resampling with forward fill — the gap-fill step every
  * panel pipeline runs before windowed features: irregular per-key
  * observations (trades, filings, events) become one row per key per
  * calendar day, with missing days carrying the last observed value
  * forward (and flagged, so downstream can distinguish observed from
  * imputed).
  *
  * Scale shape: the heavy input volume is absorbed by ONE map-side
  * combined groupBy((key, day)) pre-aggregation; the date spine is
  * generated per key from a tiny (key, min, max) frame — grid size is
  * keys × calendar days, a function of the CALENDAR, not of row count,
  * so the carry-forward window's per-key partition is bounded by the
  * date span no matter how many raw rows a key has (unlike running the
  * window over raw observations). The spine join is a key+day equi-join
  * on the already-aggregated (small) side.
  *
  * No reference counterpart (centimators assumes a complete
  * date × ticker panel as input — this operator is what PRODUCES that
  * panel); greenfield SURVEY.md §7.6 scope.
  */
object Resample {

  /** One row per (key, calendar day) between each key's first and last
    * observation: `<valueCol>_ffill` (daily mean carried forward) and
    * `is_gap` (no observation that day). */
  def dailyFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val per = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(avg(col(valueCol)).as("__v"))
    val spans = per.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as("day"))
    val joined = grid.join(per, Seq(keyCol, "day"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(col(keyCol), col("day"),
      last(col("__v"), ignoreNulls = true).over(w)
        .as(s"${valueCol}_ffill"),
      col("__v").isNull.as("is_gap"))
  }
}
