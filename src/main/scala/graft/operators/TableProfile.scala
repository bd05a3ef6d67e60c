package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-quality report a pipeline runs
  * before training on a new table: per numeric column, row count, null
  * count, distinct count, min / max / mean. The standard first step of
  * any ingest ("ANALYZE"-style column statistics), emitted as data so it
  * can be joined, thresholded, and alerted on.
  *
  * Shape: ONE aggregation over the scan producing a single row (all
  * per-column statistics as parallel aggregate expressions — partial
  * aggregation map-side, a single-row merge, no groupBy key), then a
  * constant-size reshape of that row into one output row per column.
  * The only heavyweight piece is the exact `count(DISTINCT c)` per
  * column (Catalyst plans multi-distinct aggregates through one Expand —
  * one pass over the scan, a shuffle keyed by the distinct values); at
  * 100 TB set `approxDistinct = true` to swap in
  * `approx_count_distinct` (HLL++: mergeable fixed-size sketches,
  * shuffle-free map-side partials, NO Expand — the plan collapses to
  * one ordinary single-row aggregate). Kept exact by default so the
  * profile verifies bit-for-bit against the DuckDB oracle; the approx
  * plan shape and sketch tolerance are pinned in PlanSpec.
  */
object TableProfile {

  // bit-identical HALF_UP decimal rounding (the repo's oracle contract)
  private def round(c: Column, s: Int): Column = graft.functions.FastRound(c, s)

  /** One row per profiled column:
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    * avg_value). Numeric statistics are computed over `cast(c as
    * double)` and rounded to 6 decimals (the repo's oracle convention
    * for libm-adjacent values). `approxDistinct` swaps the exact
    * multi-distinct for HLL++ at `rsd` relative standard deviation. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    def s(name: String, c: String) = s"__${name}_$c"
    val aggs: Seq[Column] = cols.flatMap { c =>
      val d = col(c).cast("double")
      val nd = if (approxDistinct) approx_count_distinct(col(c), rsd)
        else countDistinct(col(c))
      Seq(
        count(lit(1)).as(s("n", c)),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s("nn", c)),
        nd.as(s("nd", c)),
        round(min(d), 6).as(s("mn", c)),
        round(max(d), 6).as(s("mx", c)),
        round(avg(d), 6).as(s("av", c)))
    }
    // NOT input-spread: a repartition before the aggregate re-groups
    // the partial sums and the double-precision avg() is not stable at
    // the 6-decimal rounding boundary under reordered summation
    // (measured a last-digit flip vs the oracle on the gate data); the
    // Expand+partials therefore stay at the scan's natural row-group
    // parallelism, which is the correct grain at real scale anyway.
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s("n", c)).as("n_rows"),
        col(s("nn", c)).as("n_nulls"), col(s("nd", c)).as("n_distinct"),
        col(s("mn", c)).as("min_value"), col(s("mx", c)).as("max_value"),
        col(s("av", c)).as("avg_value"))
    }
    agged.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
