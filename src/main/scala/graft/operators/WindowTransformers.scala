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

/** Trailing rolling pairwise statistics between two series per group —
  * rolling correlation, beta (cov(x,y)/var(y), the hedge-ratio /
  * factor-exposure shape), and covariance: the standard quant-panel
  * companions of the reference's univariate rolling family, same
  * min-samples contract (null until the frame holds `window` rows) and
  * the same single-exchange window shape, so adjacent ticker-keyed
  * stages fuse.
  *
  * Computed from the five raw window sums (Σx, Σy, Σxy, Σx², Σy²) via
  * the sum formula — cov = (kΣxy − ΣxΣy)/(k(k−1)), corr and beta from
  * the exact integer factors kΣv² − (Σv)² — NOT from Spark's
  * corr/covar_samp co-moment aggregates, for two reasons. (1) ANSI
  * mode: the Window operator evaluates its aggregates for every row
  * regardless of any when() guard, and corr's internal division raises
  * DIVIDE_BY_ZERO on a zero-variance window; here every division lives
  * in the lazy projection with a null-guarded divisor, so degenerate
  * windows yield null instead of NaN or an error. (2) Engine-exact
  * reproducibility: co-moment streaming updates accumulate differently
  * in every engine (a measured round-boundary flip vs DuckDB at 1e-6),
  * while for integer-valued inputs the window sums are EXACT under any
  * evaluation order, so corr/beta/cov become bit-identical across
  * engines (the q_rolling_corr query feeds integer cents/units for
  * this reason; with fractional inputs the formula is still correct,
  * just not bit-pinned). Columns are assumed non-null within a pair
  * (the panel contract). No reference counterpart (time_series.py
  * stops at the moving average); greenfield SURVEY.md §7.6 scope. */
case class RollingCorrTransformer(
    xCol: String,
    yCol: String,
    windows: Seq[Int],
    tickerCol: String,
    orderCols: Seq[String]) extends GraftTransformer {
  require(windows.forall(_ >= 2), s"pairwise stats need window >= 2")
  def outputNames: Seq[String] =
    windows.flatMap(k => Seq(s"${xCol}_${yCol}_corr$k",
      s"${xCol}_${yCol}_beta$k", s"${xCol}_${yCol}_cov$k"))
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = windows.flatMap { k =>
      val frame = w.rowsBetween(-(k - 1), Window.currentRow)
      val x = col(xCol); val y = col(yCol)
      // both columns must fill the frame: a null y inside a full-x window
      // would otherwise drop rows from Σy/Σxy but not Σx — silently wrong
      // corr/beta/cov instead of the documented null degradation
      val full = count(x).over(frame) === k && count(y).over(frame) === k
      val n = lit(k)
      val dxy = (n * sum(x * y).over(frame)
        - sum(x).over(frame) * sum(y).over(frame)).cast("double")
      def fac(v: Column) = (n * sum(v * v).over(frame)
        - sum(v).over(frame) * sum(v).over(frame)).cast("double")
      val fx = fac(x); val fy = fac(y)
      Seq(
        when(full, dxy / when(fx > 0 && fy > 0, sqrt(fx * fy)))
          .as(s"${xCol}_${yCol}_corr$k"),
        when(full, dxy / when(fy > 0, fy)).as(s"${xCol}_${yCol}_beta$k"),
        when(full, dxy / lit((k.toLong * (k - 1)).toDouble))
          .as(s"${xCol}_${yCol}_cov$k"))
    }
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Truncated exponentially-weighted moving average per group — the
  * pandas `ewm(span=...).mean()` shape every quant panel uses for
  * decayed smoothing, with the tail truncated at `lookback` lags:
  * ewma_t = Σ_{j<L} α^j·x_{t−j} / Σ_{j<L over available} α^j (the
  * adjust=True normalization restricted to the window), α = 1 − 2/(span
  * +1). With span-sized half-life the dropped tail weight is α^L —
  * negligible for L ≳ 3·span — and truncation is what makes the
  * operator a PURE PROJECTION after one per-ticker sort: each term is a
  * `lag` over the shared window spec (no recursive state, no UDAF), the
  * weighted sum is an explicit left-associated chain of double
  * literals, so the result is bit-identical on any engine evaluating
  * the same chain — the DuckDB oracle mirrors it lag-for-lag. Early
  * rows (fewer than `lookback` lags available) normalize over the
  * weights of the lags that exist, matching pandas' expanding head.
  * No reference counterpart (time_series.py stops at the flat moving
  * average); greenfield SURVEY.md §7.6 scope. */
case class EwmaTransformer(
    featureCols: Seq[String],
    span: Double,
    lookback: Int,
    tickerCol: String,
    orderCols: Seq[String]) extends GraftTransformer {
  require(span > 1 && lookback >= 1, s"ewma: span=$span lookback=$lookback")
  private val alpha = 1.0 - 2.0 / (span + 1.0)
  def outputNames: Seq[String] = featureCols.map(f => s"${f}_ewma")
  def transform(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(tickerCol).orderBy(orderCols.map(col): _*)
    val outs = featureCols.map { f =>
      val terms = (0 until lookback).map { j =>
        val x = if (j == 0) col(f) else lag(col(f), j).over(w)
        (when(x.isNotNull, lit(math.pow(alpha, j))).otherwise(lit(0.0)),
          when(x.isNotNull, x * lit(math.pow(alpha, j))).otherwise(lit(0.0)))
      }
      val num = terms.map(_._2).reduceLeft(_ + _)
      val den = terms.map(_._1).reduceLeft(_ + _)
      (num / when(den > 0, den)).as(s"${f}_ewma")
    }
    df.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Per-row statistics across feature groups (horizontal aggregation).
  * Reference: GroupStatsTransformer, stats.py:20-146 — output
  * `{group}_groupstats_{stat}`, with NaN thresholds (std needs >= 2 cols,
  * skew >= 3, kurt >= 4; stats.py:97-104). Pure projection: no shuffle.
  *
  * The row-mean and row-std are STAGED as intermediate columns rather
  * than composed from the package helpers: the naive composition
  * re-expands the mean inside the std and both inside skew/kurt/cv, so
  * the projection tree (and the generated code evaluating it) grows
  * multiplicatively with the stat list — measured 2.4s → staged ~1s on
  * the 4-column bench query. The staged expressions are the SAME
  * arithmetic as the helpers (bit-identical outputs); CollapseProject
  * keeps the staging because the aliases are non-cheap and
  * multiply-referenced. */
case class GroupStatsTransformer(
    mapping: Map[String, Seq[String]],
    stats: Seq[String] = Seq("mean", "std", "skew", "kurt", "range", "cv"))
    extends GraftTransformer {
  private val validStats = Set("mean", "std", "skew", "kurt", "range", "cv")
  require(stats.forall(validStats), s"stats must be within $validStats")
  def outputNames: Seq[String] =
    for ((g, _) <- mapping.toSeq; s <- stats) yield s"${g}_groupstats_$s"

  // Same shapes as functions.{skew,kurtosis}Horizontal with the mean and
  // std taken from the staged columns instead of re-expanded inline.
  private def statCol(stat: String, cols: Seq[Column], m: Column,
      s: Column): Column = {
    val n = cols.size
    stat match {
      case "mean" => m
      case "std"  => s
      case "skew" =>
        if (n < 3) lit(Double.NaN)
        else cols.map(c => pow((c.cast("double") - m) / s, 3.0))
          .reduce(_ + _) *
          lit(n.toDouble / ((n - 1).toDouble * (n - 2).toDouble))
      case "kurt" =>
        if (n < 4) lit(Double.NaN)
        else {
          val t1 = (n.toDouble * (n + 1).toDouble) /
            ((n - 1).toDouble * (n - 2).toDouble * (n - 3).toDouble)
          val t2 = 3.0 * (n - 1).toDouble * (n - 1).toDouble /
            ((n - 2).toDouble * (n - 3).toDouble)
          cols.map(c => pow((c.cast("double") - m) / s, 4.0))
            .reduce(_ + _) * lit(t1) - lit(t2)
        }
      case "range" => rangeHorizontal(cols)
      case "cv"    => s / m
    }
  }

  def transform(df: DataFrame): DataFrame = {
    val groups = mapping.toSeq
    val needsS = stats.exists(Set("std", "skew", "kurt", "cv"))
    val needsM = needsS || stats.contains("mean")
    val base = df.columns.map(col)
    // stage 1: row means; stage 2: row stds (reference the staged mean)
    val withM =
      if (!needsM) df
      else df.select(base ++ groups.map { case (g, cs) =>
        meanHorizontal(cs.map(col)).as(s"__gs_m_$g")
      }: _*)
    val withS =
      if (!needsS) withM
      else withM.select(withM.columns.map(col) ++ groups.map { case (g, cs) =>
        val n = cs.size
        val sd = // varHorizontal shape with the staged mean
          if (n - 1 <= 0) lit(Double.NaN)
          else {
            val m = col(s"__gs_m_$g")
            val ss = cs.map(c => when(col(c).isNotNull,
              pow(col(c).cast("double") - m, 2.0)).otherwise(lit(0.0)))
              .reduce(_ + _)
            sqrt(ss / lit((n - 1).toDouble))
          }
        sd.as(s"__gs_s_$g")
      }: _*)
    val outs = for ((g, cs) <- groups; st <- stats) yield
      statCol(st, cs.map(col),
        if (needsM) col(s"__gs_m_$g") else lit(Double.NaN),
        if (needsS) col(s"__gs_s_$g") else lit(Double.NaN))
        .as(s"${g}_groupstats_$st")
    withS.select(base ++ outs: _*)
  }
}
