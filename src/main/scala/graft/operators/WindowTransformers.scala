package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Cross-sectional normalized rank within a date group.
  *
  * Reference: RankTransformer (ranking.py:9-92): narwhals average-tie
  * `.rank().over(date)` divided by the non-null `.count().over(date)`,
  * output `{f}_rank` in (0, 1].
  *
  * Scale notes: one hash exchange on `dateCol`; rank + peer-count + count
  * share a single partitioning (peer count uses a RANGE CURRENT ROW frame
  * over the same sort), so Catalyst plans exactly one shuffle and one sort.
  */
case class RankTransformer(featureCols: Seq[String], dateCol: String)
    extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"${f}_rank")
  def transform(df: DataFrame): DataFrame = {
    val part = Seq(col(dateCol))
    val outs = featureCols.map(f => normalizedRank(col(f), part).as(s"${f}_rank"))
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Per-group lag features, lag-major column order, windows sorted
  * descending (reference: LagTransformer, time_series.py:9-89 — the
  * `windows=sorted(windows, reverse=True)` contract at :38, column order
  * pinned at :56-59).
  */
case class LagTransformer(
    featureCols: Seq[String],
    windows: Seq[Int],
    tickerCol: String,
    orderCols: Seq[String]) extends GraftTransformer {
  private val sortedWindows = windows.sorted(Ordering.Int.reverse)
  def outputNames: Seq[String] =
    for (w <- sortedWindows; f <- featureCols) yield s"${f}_lag$w"
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = for (k <- sortedWindows; f <- featureCols)
      yield lag(col(f), k).over(w).as(s"${f}_lag$k")
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Trailing moving average with min_samples = window_size (first w-1 rows
  * of each group are null). Reference: MovingAverageTransformer,
  * time_series.py:92-146; null contract pinned by
  * tests/test_feature_transformers.py:62-68. Feature-major column order
  * (time_series.py:142-146). Shares one exchange+sort with any adjacent
  * transformer using the same (ticker, order) spec.
  */
case class MovingAverageTransformer(
    featureCols: Seq[String],
    windows: Seq[Int],
    tickerCol: String,
    orderCols: Seq[String]) extends GraftTransformer {
  def outputNames: Seq[String] =
    for (f <- featureCols; w <- windows) yield s"${f}_ma$w"
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = for (f <- featureCols; k <- windows)
      yield rollingMean(col(f), k, w).as(s"${f}_ma$k")
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Trailing rolling std / min / max with the MovingAverage min-samples
  * contract (null until the frame holds `window` values) — the rolling
  * statistics a panel pipeline needs beyond the reference's moving
  * average, same single-exchange window shape (adjacent ticker-keyed
  * stages fuse into one exchange + sort). */
case class RollingStatsTransformer(
    featureCols: Seq[String],
    windows: Seq[Int],
    tickerCol: String,
    orderCols: Seq[String],
    stats: Seq[String] = Seq("std", "min", "max")) extends GraftTransformer {
  require(stats.forall(Set("std", "min", "max")),
    s"stats must be std|min|max, got $stats")
  def outputNames: Seq[String] =
    for (f <- featureCols; k <- windows; s <- stats) yield s"${f}_$s$k"
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = for (f <- featureCols; k <- windows; s <- stats) yield {
      val frame = w.rowsBetween(-(k - 1), Window.currentRow)
      val v = col(f)
      val stat = s match {
        case "std" => stddev_samp(v).over(frame)
        case "min" => min(v).over(frame)
        case "max" => max(v).over(frame)
      }
      when(count(v).over(frame) === k, stat).as(s"${f}_$s$k")
    }
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Natural-log return per group: ln(f) - lag(ln(f), 1); first row per group
  * null. Reference: LogReturnTransformer, time_series.py:149-197. */
case class LogReturnTransformer(
    featureCols: Seq[String],
    tickerCol: String,
    orderCols: Seq[String]) extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"${f}_logreturn")
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = featureCols.map(f => logReturn(col(f), w).as(s"${f}_logreturn"))
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Per-row statistics across feature groups (horizontal aggregation).
  * Reference: GroupStatsTransformer, stats.py:20-146 — output
  * `{group}_groupstats_{stat}`, with NaN thresholds (std needs >= 2 cols,
  * skew >= 3, kurt >= 4; stats.py:97-104). Pure projection: no shuffle. */
case class GroupStatsTransformer(
    mapping: Map[String, Seq[String]],
    stats: Seq[String] = Seq("mean", "std", "skew", "kurt", "range", "cv"))
    extends GraftTransformer {
  private val validStats = Set("mean", "std", "skew", "kurt", "range", "cv")
  require(stats.forall(validStats), s"stats must be within $validStats")
  def outputNames: Seq[String] =
    for ((g, _) <- mapping.toSeq; s <- stats) yield s"${g}_groupstats_$s"
  private def statCol(stat: String, cols: Seq[Column]): Column = stat match {
    case "mean"  => meanHorizontal(cols)
    case "std"   => stdHorizontal(cols, 1)
    case "skew"  => skewHorizontal(cols)
    case "kurt"  => kurtosisHorizontal(cols)
    case "range" => rangeHorizontal(cols)
    case "cv"    => cvHorizontal(cols, 1)
  }
  def transform(df: DataFrame): DataFrame = {
    val outs = for ((g, cols) <- mapping.toSeq; s <- stats)
      yield statCol(s, cols.map(col)).as(s"${g}_groupstats_$s")
    df.select(df.columns.map(col) ++ outs: _*)
  }
}
