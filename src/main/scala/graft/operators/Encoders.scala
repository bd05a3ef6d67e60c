package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical target encoding with leave-one-out: each row's category
  * is replaced by the mean of the TARGET over the other rows of the same
  * category — (Σ_g − y_i)/(n_g − 1) — the standard high-cardinality
  * categorical feature for tabular models, leakage-free because the
  * row's own target is excluded. Optionally blended toward the global
  * mean by `smoothing` (the empirical-Bayes shrinkage m/(n+m) form).
  *
  * Scale shape: per category column, ONE map-side-combined groupBy
  * producing (Σ_g, n_g) — two scalars per category — broadcast back
  * onto the un-shuffled fact frame (null-safe key, so a null category
  * still LOO-encodes within its group). The fact side never shuffles
  * and a monster category costs nothing beyond its partial sums; the
  * earlier aggregate-only window form serialized every row of the
  * hottest category into one WindowExec task. The broadcast holds
  * |categories| rows — target encoding presumes aggregable category
  * cardinality (millions, not billions; beyond that LOO means are
  * statistically meaningless anyway). Plus a broadcast 1-row
  * global-mean frame. Categories with a single row fall back to the
  * global mean.
  *
  * Output: `{cat}_te[_{suffix}]` per category column.
  */
case class TargetEncoder(catCols: Seq[String], targetCol: String,
    smoothing: Double = 0.0, suffix: Option[String] = None)
    extends GraftTransformer {
  def outputNames: Seq[String] =
    catCols.map(c => suffix.fold(s"${c}_te")(s => s"${c}_te_$s"))
  def transform(df: DataFrame): DataFrame = {
    val y = col(targetCol).cast("double")
    val scalars = df.agg(avg(y).as("__gm"))
    val joined = df.crossJoin(broadcast(scalars))
    catCols.zip(outputNames).foldLeft(joined) { case (acc, (c, out)) =>
      val stats = df.groupBy(col(c).as("__te_key"))
        .agg(sum(y).as("__te_s"), count(y).as("__te_n"))
      val n = col("__te_n")
      val loo = (col("__te_s") - y) / (n - lit(1)).cast("double")
      val blended =
        if (smoothing <= 0) loo
        else (loo * (n - 1).cast("double") + lit(smoothing) * col("__gm")) /
          ((n - 1).cast("double") + lit(smoothing))
      acc.join(broadcast(stats), acc(c) <=> col("__te_key"), "left")
        .withColumn(out, when(n > 1, blended).otherwise(col("__gm")))
        .drop("__te_key", "__te_s", "__te_n")
    }.drop("__gm")
  }
}

/** Per-group robust scaling: (x − median) / (1.4826 · MAD), the
  * outlier-insensitive alternative to z-scoring (1.4826 makes MAD a
  * consistent σ estimator under normality). Degenerate MAD (< 1e-12)
  * yields null rather than ±inf.
  *
  * Exact mode runs ONE fused `median_mad` aggregate per feature
  * ([[graft.functions.MedianMadAgg]]): each group's values are buffered
  * once and both statistics probed from the same sorted array — one
  * scan + one all-values shuffle, where the composable two-pass
  * formulation (median, re-scan, median of |x−med|) costs two of each.
  * The buffer shape matches `percentile` (every group value in the
  * ObjectHashAggregate buffer, merged map-side) — fine for bounded-
  * cardinality groups (eras, categories), a per-group memory hazard
  * when one group holds billions of rows. Set `approx = true` for the
  * scale path: `approx_percentile` (KLL-style bounded sketch, mergeable
  * map-side) holds O(accuracy) state per group regardless of group size
  * (necessarily two-pass — the MAD sketch needs the median first).
  * Exact stays the default (and the oracle mode — the interpolation is
  * the same estimator DuckDB's quantile_cont implements).
  *
  * Output: `{f}_robust` per feature.
  */
case class RobustScaler(featureCols: Seq[String], groupCol: String,
    approx: Boolean = false, accuracy: Int = 10000)
    extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"${f}_robust")
  def transform(df: DataFrame): DataFrame =
    if (approx) transformApprox(df) else transformExact(df)

  private def transformExact(df: DataFrame): DataFrame = {
    val aggs = featureCols.map(f =>
      graft.functions.MedianMad(col(f).cast("double")).as(s"__mm_$f"))
    val stats = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(broadcast(stats), Seq(groupCol))
    val outs = featureCols.map { f =>
      val med = element_at(col(s"__mm_$f"), 1)
      val mad = element_at(col(s"__mm_$f"), 2)
      when(mad > 1e-12, (col(f) - med) / (lit(1.4826) * mad))
        .as(s"${f}_robust")
    }
    joined.select(df.columns.map(col) ++ outs: _*)
  }

  private def transformApprox(df: DataFrame): DataFrame = {
    def pct(e: String): String = s"approx_percentile($e, 0.5, $accuracy)"
    val medAggs = featureCols.map(f =>
      expr(pct(s"`$f`")).as(s"__med_$f"))
    val meds = df.groupBy(col(groupCol)).agg(medAggs.head, medAggs.tail: _*)
    val withMed = df.join(broadcast(meds), Seq(groupCol))
    val madAggs = featureCols.map(f =>
      expr(pct(s"abs(`$f` - `__med_$f`)")).as(s"__mad_$f"))
    val mads = withMed.groupBy(col(groupCol))
      .agg(madAggs.head, madAggs.tail: _*)
    val joined = withMed.join(broadcast(mads), Seq(groupCol))
    val outs = featureCols.map { f =>
      when(col(s"__mad_$f") > 1e-12,
        (col(f) - col(s"__med_$f")) / (lit(1.4826) * col(s"__mad_$f")))
        .as(s"${f}_robust")
    }
    joined.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Per-group winsorization: clip a column at its group's [lo, hi]
  * quantiles (exact `percentile`, linear interpolation — the same
  * estimator DuckDB's quantile_cont uses). The tiny per-group quantile
  * frame broadcasts back — never an all-rows window sort.
  *
  * `approx = true` swaps in `approx_percentile` for the scale path —
  * bounded mergeable per-group state instead of buffering every value;
  * see [[RobustScaler]].
  *
  * Output: `{f}_wins` per feature.
  */
case class Winsorizer(featureCols: Seq[String], groupCol: String,
    lo: Double = 0.05, hi: Double = 0.95,
    approx: Boolean = false, accuracy: Int = 10000)
    extends GraftTransformer {
  require(lo >= 0 && hi <= 1 && lo < hi, s"bad quantile range [$lo, $hi]")
  def outputNames: Seq[String] = featureCols.map(f => s"${f}_wins")
  // ONE percentile aggregate per feature with BOTH percentages: the
  // group's value buffer is built once and probed twice, instead of two
  // aggregates each buffering the full group (measured 2x on the
  // bench's 600k-row groups). Exact mode uses the primitive-buffer
  // aggregate (graft.functions.ExactPercentilesAgg — same estimator as
  // percentile/quantile_cont, no boxed hash map).
  private def pct(f: String): Column =
    if (approx) expr(s"approx_percentile(`$f`, array($lo, $hi), $accuracy)")
    else graft.functions.ExactPercentiles(
      col(f).cast("double"), Seq(lo, hi))
  def transform(df: DataFrame): DataFrame = {
    val aggs = featureCols.map(f => pct(f).as(s"__q_$f"))
    val qs = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(broadcast(qs), Seq(groupCol))
    val outs = featureCols.map { f =>
      least(greatest(col(f), element_at(col(s"__q_$f"), 1)),
        element_at(col(s"__q_$f"), 2)).as(s"${f}_wins")
    }
    joined.select(df.columns.map(col) ++ outs: _*)
  }
}
