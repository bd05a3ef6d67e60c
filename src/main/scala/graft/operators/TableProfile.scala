package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-quality report a pipeline runs
  * before training on a new table: per numeric column, row count, null
  * count, distinct count, min / max / mean. The standard first step of
  * any ingest ("ANALYZE"-style column statistics), emitted as data so it
  * can be joined, thresholded, and alerted on.
  *
  * Shape: the order-sensitive statistics (count/nulls/min/max/avg) are
  * ONE aggregation over the scan producing a single row (partial
  * aggregation map-side, a single-row merge, no groupBy key), then a
  * constant-size reshape of that row into one output row per column.
  * The exact `count(DISTINCT c)` columns run as a SEPARATE subtree:
  * Catalyst's multi-distinct rewrite (one Expand over ALL profiled
  * columns, a 7-wide nullable grouping key, the distinct hash build
  * pinned at the scan's row-group parallelism) measured as ~85% of the
  * profile cost — here the distinct pairs explode to a NARROW
  * (cid, value) key, spread by an explicit count-pinned repartition on
  * exactly that key (distinct COUNTS are order-insensitive integers, so
  * unlike the avg() partials the spread is value-safe), and dedup +
  * count run at full parallelism with no further exchange. The stats
  * aggregate deliberately stays UNSPREAD so its partial sums keep the
  * scan's natural grouping (avg() is not reorder-stable at the
  * 6-decimal rounding boundary — measured as a last-digit oracle flip
  * when spread). At 100 TB set `approxDistinct = true` to swap in
  * `approx_count_distinct` (HLL++: mergeable fixed-size sketches,
  * shuffle-free map-side partials — the plan collapses back to one
  * ordinary single-row aggregate). Kept exact by default so the
  * profile verifies bit-for-bit against the DuckDB oracle; both plan
  * shapes and the sketch tolerance are pinned in PlanSpec.
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
    // NOT input-spread: a repartition before this aggregate re-groups
    // the partial sums and the double-precision avg() is not stable at
    // the 6-decimal rounding boundary under reordered summation
    // (measured a last-digit flip vs the oracle on the gate data); the
    // partials therefore stay at the scan's natural row-group
    // parallelism, which is the correct grain at real scale anyway.
    val statAggs: Seq[Column] = cols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(
        count(lit(1)).as(s("n", c)),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s("nn", c)),
        round(min(d), 6).as(s("mn", c)),
        round(max(d), 6).as(s("mx", c)),
        round(avg(d), 6).as(s("av", c))) ++
        (if (approxDistinct)
          Seq(approx_count_distinct(col(c), rsd).as(s("nd", c)))
        else Nil)
    }
    val agged = df.agg(statAggs.head, statAggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), lit(c).as("col_name"),
        col(s("n", c)).as("n_rows"), col(s("nn", c)).as("n_nulls"),
        (if (approxDistinct) col(s("nd", c)) else lit(null).cast("long"))
          .as("n_distinct"),
        col(s("mn", c)).as("min_value"), col(s("mx", c)).as("max_value"),
        col(s("av", c)).as("avg_value"))
    }
    val stats = agged.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
    if (approxDistinct)
      stats.drop("cid")
    else {
      // exact distincts, the narrow-key spread subtree: per column, one
      // (cid, value) pair per non-null row — columns grouped by data
      // type so each explode array is well-typed — spread ON the
      // grouping key with a PINNED count (AQE keeps user counts; the
      // filter and explode stay below the exchange so the shuffle
      // carries only surviving pairs), then distinct + per-cid count
      // with no further pair-sized exchange.
      val spark = df.sparkSession
      val target = spark.sparkContext.defaultParallelism
      val pairFrames = cols.zipWithIndex
        .groupBy { case (c, _) => df.schema(c).dataType }
        .toSeq.sortBy(_._2.head._2).map { case (_, grp) =>
          df.select(explode(array(grp.map { case (c, i) =>
            struct(lit(i).as("cid"), col(c).as("v")) }: _*)).as("p"))
            .select(col("p.cid").as("cid"), col("p.v").as("v"))
            .where(col("v").isNotNull)
        }
      val dcounts = pairFrames.reduce(_ unionByName _)
        .repartition(target, col("cid"), col("v"))
        .distinct()
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("__nd"))
      // left join + coalesce: an all-null column has zero pairs but
      // must still report n_distinct = 0
      stats.join(dcounts, Seq("cid"), "left")
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          coalesce(col("__nd"), lit(0L)).as("n_distinct"),
          col("min_value"), col("max_value"), col("avg_value"))
    }
  }
}
