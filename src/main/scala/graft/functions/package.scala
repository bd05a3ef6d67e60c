package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level building blocks of the engine.
  *
  * Everything here is pure `Column` composition (Catalyst expressions) — no
  * UDFs — so the whole surface stays inside WholeStageCodegen and predicate
  * pushdown / column pruning keep working at 100 TB scale.
  *
  * Reference semantics (cited per function) come from
  * crowdcent/centimators `src/centimators/narwhals_utils.py` and
  * the `src/centimators/feature_transformers` modules.
  */
package object functions {

  /** Φ⁻¹ as a codegen'd Catalyst expression. */
  def inv_norm_cdf(c: Column): Column = InverseNormalCdf(c)

  // ---------------------------------------------------------------------
  // Average-tie rank (reference: ranking.py:52-79; narwhals .rank() default
  // tie method is "average", .count() counts non-null).
  //
  // avg_rank(v) = cntLE(v) - (|peers(v)| - 1)/2, where cntLE is the
  // running non-null count over a RANGE UNBOUNDED PRECEDING..CURRENT ROW
  // frame (peers included) and |peers| a RANGE CURRENT ROW frame. Both
  // frames share ONE window spec (same partitioning, same sort), so the
  // whole construct is ONE exchange + ONE sort + ONE Window operator.
  // The earlier rank()-minus-null-count form carried a SECOND,
  // unordered window (partition-wide null count) — a separate Window
  // operator that buffered every partition again (measured ~1/3 of the
  // rank stage on the 3-group metric queries). Values are identical:
  // for a non-null row, cntLE = #less + #peers, so
  // cntLE - (peers-1)/2 = #less + 1 + (peers-1)/2 = rank among
  // non-nulls + (peers-1)/2 — all exact integers/half-integers in
  // doubles, bit-equal to the old form.
  // ---------------------------------------------------------------------

  /** Average-tie rank of `v` within `part` (nulls rank null). */
  def avgRank(v: Column, part: Seq[Column]): Column = {
    val w = Window.partitionBy(part: _*).orderBy(v.asc_nulls_first)
    val cntLE = count(v).over(
      w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val peers = count(v).over(w.rangeBetween(Window.currentRow, Window.currentRow))
    when(v.isNotNull, cntLE - (peers - lit(1)) / lit(2.0))
  }

  /** Normalized average-tie rank in (0, 1]: avgRank / non-null count
    * (reference: ranking.py:69-79). The count rides the SAME ordered
    * window spec as avgRank (unbounded frame) so no second unordered
    * Window operator is planned. */
  def normalizedRank(v: Column, part: Seq[Column]): Column = {
    val w = Window.partitionBy(part: _*).orderBy(v.asc_nulls_first)
    val cnt = count(v).over(w.rangeBetween(
      Window.unboundedPreceding, Window.unboundedFollowing))
    avgRank(v, part) / cnt
  }

  // ---------------------------------------------------------------------
  // Horizontal (row-wise) statistics over a fixed set of k columns.
  // Pure projected arithmetic — no shuffle, no aggregation.
  // Reference: narwhals_utils.py:31-212. Constants (ddof, bias corrections)
  // use the STATIC column count n = k (narwhals_utils.py:44, :96, :150),
  // while mean/sum skip nulls per-row (narwhals mean_horizontal).
  // ---------------------------------------------------------------------

  private def nonNullCount(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _).cast("double")

  /** Null-skipping row-wise sum (narwhals sum_horizontal). */
  def sumHorizontal(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c.cast("double"), lit(0.0))).reduce(_ + _)

  /** Null-skipping row-wise mean (narwhals mean_horizontal). */
  def meanHorizontal(cols: Seq[Column]): Column =
    sumHorizontal(cols) / nonNullCount(cols)

  /** Row-wise variance, divisor n - ddof with n = number of columns
    * (narwhals_utils.py:31-58). NaN when n - ddof <= 0. */
  def varHorizontal(cols: Seq[Column], ddof: Int = 1): Column = {
    val n = cols.size
    if (n == 0 || n - ddof <= 0) lit(Double.NaN)
    else {
      val m = meanHorizontal(cols)
      val ss = cols.map(c => when(c.isNotNull, pow(c.cast("double") - m, 2.0))
        .otherwise(lit(0.0))).reduce(_ + _)
      ss / lit((n - ddof).toDouble)
    }
  }

  def stdHorizontal(cols: Seq[Column], ddof: Int = 1): Column =
    sqrt(varHorizontal(cols, ddof))

  /** Bias-corrected row-wise skewness: n/((n-1)(n-2)) * Σ((x-μ)/s)³;
    * NaN for n < 3 and for zero std (0/0 → NaN) (narwhals_utils.py:80-115). */
  def skewHorizontal(cols: Seq[Column]): Column = {
    val n = cols.size
    if (n < 3) lit(Double.NaN)
    else {
      val m = meanHorizontal(cols)
      val s = stdHorizontal(cols, 1)
      val sum3 = cols.map(c => pow((c.cast("double") - m) / s, 3.0)).reduce(_ + _)
      sum3 * lit(n.toDouble / ((n - 1).toDouble * (n - 2).toDouble))
    }
  }

  /** Bias-corrected row-wise excess kurtosis G2; NaN for n < 4
    * (narwhals_utils.py:118-162). */
  def kurtosisHorizontal(cols: Seq[Column]): Column = {
    val n = cols.size
    if (n < 4) lit(Double.NaN)
    else {
      val m = meanHorizontal(cols)
      val s = stdHorizontal(cols, 1)
      val sum4 = cols.map(c => pow((c.cast("double") - m) / s, 4.0)).reduce(_ + _)
      val t1 = (n.toDouble * (n + 1).toDouble) /
        ((n - 1).toDouble * (n - 2).toDouble * (n - 3).toDouble)
      val t2 = 3.0 * (n - 1).toDouble * (n - 1).toDouble /
        ((n - 2).toDouble * (n - 3).toDouble)
      sum4 * lit(t1) - lit(t2)
    }
  }

  /** Row-wise max - min (narwhals_utils.py:165-182). */
  def rangeHorizontal(cols: Seq[Column]): Column =
    if (cols.size == 1) lit(0.0)
    else greatest(cols: _*).cast("double") - least(cols: _*).cast("double")

  /** Row-wise coefficient of variation std/mean (narwhals_utils.py:185-212). */
  def cvHorizontal(cols: Seq[Column], ddof: Int = 1): Column =
    stdHorizontal(cols, ddof) / meanHorizontal(cols)

  // ---------------------------------------------------------------------
  // Rolling helpers (reference: time_series.py).
  // ---------------------------------------------------------------------

  /** Trailing moving average over the previous `window` rows with
    * min_samples = window (narwhals rolling_mean default): null until the
    * frame holds `window` non-null values (time_series.py:120-127; pinned by
    * tests/test_feature_transformers.py:62-68). */
  def rollingMean(v: Column, window: Int, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-(window - 1), Window.currentRow)
    when(count(v).over(frame) === window, avg(v).over(frame))
  }

  /** Natural-log return: ln(v) - lag(ln(v), 1) (time_series.py:175-182). */
  def logReturn(v: Column, w: WindowSpec): Column =
    log(v) - lag(log(v), 1).over(w)

  /** Min-max scale to [0,1] with degenerate-range → 0.5
    * (reference base.py:17-23, epsilon 1e-10). `mn`/`mx` are precomputed
    * scalar columns (from a broadcast aggregate — not a global window). */
  def minMaxScale(v: Column, mn: Column, mx: Column): Column =
    when(mx - mn < lit(1e-10), lit(0.5)).otherwise((v - mn) / (mx - mn))
}
