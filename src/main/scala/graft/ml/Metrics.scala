package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regression metrics (reference §2.8): exact Spearman (rank-then-Pearson)
  * and R². */
object Metrics {

  /** Spearman rank correlation between two columns per group (exact form
    * of the reference's differentiable SpearmanCorrelation loss,
    * losses.py:22-122). Exact ranking partitions the window by group —
    * correct and fast for many bounded groups, but a FEW GIANT groups
    * each funnel through one task; for that shape use
    * [[spearmanBinned]], the bounded-state scale path. */
  def spearman(df: DataFrame, a: String, b: String,
      groupCols: Seq[String]): DataFrame = {
    import graft.functions.avgRank
    val part = groupCols.map(col)
    val ranked = df.select(part ++ Seq(
      avgRank(col(a), part).as("__ra"), avgRank(col(b), part).as("__rb")): _*)
    ranked.groupBy(part: _*).agg(corr(col("__ra"), col("__rb")).as("spearman"))
  }

  /** Corpus-scale approximate Spearman: ranks are replaced by
    * quantile-bin indices from a mergeable `approx_percentile` sketch
    * (bounded state per group, normal map-side partial aggregation — no
    * per-group total order, so a 100 TB group never serializes through
    * one task). Spearman = Pearson of ranks, and the bin index is a
    * monotone midrank proxy, so the estimate converges to the exact
    * coefficient as bins grow (error O(1/bins) for continuous data; ties
    * land in one bin, preserving average-rank semantics approximately).
    * Plan: one grouped sketch aggregate → broadcast boundaries back →
    * map-side bin assignment → one grouped corr. */
  def spearmanBinned(df: DataFrame, a: String, b: String,
      groupCols: Seq[String], bins: Int = 1024): DataFrame = {
    val part = groupCols.map(col)
    // rows with a null in either column are excluded (they carry no rank
    // information; leaving them in would alias null to the lowest bin)
    val clean = df.where(col(a).isNotNull && col(b).isNotNull)
    val probs = array((1 until bins).map(i =>
      lit(i.toDouble / bins)): _*)
    val acc = lit(math.max(10000, bins * 10))
    val sketch = clean.groupBy(part: _*).agg(
      percentile_approx(col(a), probs, acc).as("__qa"),
      percentile_approx(col(b), probs, acc).as("__qb"))
    val joined =
      if (groupCols.isEmpty) clean.crossJoin(broadcast(sketch))
      else clean.join(broadcast(sketch), groupCols)
    // bin index = #boundaries strictly below the value (0..bins-1)
    def binIdx(c: String, bounds: String) =
      size(filter(col(bounds), t => t < col(c)))
    joined
      .select(part ++ Seq(
        binIdx(a, "__qa").cast("double").as("__ba"),
        binIdx(b, "__qb").cast("double").as("__bb")): _*)
      .groupBy(part: _*)
      .agg(corr(col("__ba"), col("__bb")).as("spearman"))
  }

  /** Soft differentiable Spearman loss (reference losses.py:76-117):
    * soft_rank(x)_i = Σ_j σ((x_i − x_j)/τ), then the NEGATIVE Pearson
    * correlation of the two soft-rank vectors with the reference's
    * ε-stabilized denominator √(Σ(x−x̄)²·Σ(y−ȳ)² + ε).
    *
    * Pairwise soft ranks are inherently O(n²) per group — the reference
    * evaluates this loss on training MINI-BATCHES (batch_size rows), never
    * corpus-wide, and this method keeps that contract: groups must be
    * batch-bounded (≲ a few thousand rows). The right side of the pairwise
    * self-join is a 2-column projection of a batch, so it is broadcast —
    * the n² expansion happens map-side with ZERO shuffle before the
    * per-row rank aggregation; only the two small aggregations exchange.
    * For corpus-scale rank correlation use [[spearman]] (exact, O(n log n)).
    *
    * `idCols` must uniquely identify rows within a group (they key the
    * pairwise sums back to rows). */
  def softSpearman(df: DataFrame, predCol: String, targetCol: String,
      groupCols: Seq[String], idCols: Seq[String],
      tau: Double = 1.0, epsilon: Double = 1e-7): DataFrame = {
    def sigmoid(d: Column): Column = lit(1.0) / (lit(1.0) + exp(-d / lit(tau)))
    val part = groupCols.map(col)
    val left = df.select((groupCols ++ idCols).map(col) ++ Seq(
      col(predCol).cast("double").as("__p"),
      col(targetCol).cast("double").as("__y")): _*)
    val right = broadcast(df.select(part ++ Seq(
      col(predCol).cast("double").as("__p2"),
      col(targetCol).cast("double").as("__y2")): _*))
    val ranks = left.join(right, groupCols)
      .groupBy((groupCols ++ idCols).map(col): _*)
      .agg(sum(sigmoid(col("__p") - col("__p2"))).as("__rp"),
        sum(sigmoid(col("__y") - col("__y2"))).as("__ry"))
    ranks.groupBy(part: _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__rp")).as("__sp"), sum(col("__ry")).as("__sy"),
        sum(col("__rp") * col("__ry")).as("__spy"),
        sum(col("__rp") * col("__rp")).as("__spp"),
        sum(col("__ry") * col("__ry")).as("__syy"))
      .select(part :+ (-(
        (col("__spy") - col("__sp") * col("__sy") / col("__n")) /
          sqrt((col("__spp") - col("__sp") * col("__sp") / col("__n")) *
            (col("__syy") - col("__sy") * col("__sy") / col("__n"))
            + lit(epsilon)))).as("soft_spearman_loss"): _*)
  }

  /** CombinedLoss (reference losses.py:125-189): weighted sum of MSE (for
    * absolute accuracy) and NEGATIVE Spearman correlation (for rank
    * preservation) per group — the exact-rank form of the reference's
    * soft-rank training loss (same exact-vs-soft mapping as [[spearman]]).
    * Both terms come out of ONE groupBy over the rank-augmented rows: one
    * window pass for the two rank columns, one aggregation exchange. */
  def combinedLoss(df: DataFrame, predCol: String, targetCol: String,
      groupCols: Seq[String], mseWeight: Double = 2.0,
      spearmanWeight: Double = 1.0): DataFrame = {
    import graft.functions.avgRank
    val part = groupCols.map(col)
    val ranked = df.select(part ++ Seq(
      col(predCol).cast("double").as("__p"),
      col(targetCol).cast("double").as("__y"),
      avgRank(col(predCol), part).as("__rp"),
      avgRank(col(targetCol), part).as("__ry")): _*)
    ranked.groupBy(part: _*).agg(
      (lit(mseWeight) * avg(pow(col("__p") - col("__y"), 2.0))
        + lit(spearmanWeight) * -corr(col("__ry"), col("__rp")))
        .as("combined_loss"))
  }

  /** Giant-group scale path for [[combinedLoss]]: exact MSE (a plain
    * mergeable aggregate) + the [[spearmanBinned]] sketch-rank
    * correlation — no per-group window anywhere, so group size never
    * bounds parallelism. Converges to the exact combined loss at
    * O(1/bins). */
  def combinedLossBinned(df: DataFrame, predCol: String,
      targetCol: String, groupCols: Seq[String], mseWeight: Double = 2.0,
      spearmanWeight: Double = 1.0, bins: Int = 1024): DataFrame = {
    val part = groupCols.map(col)
    val mse = df.groupBy(part: _*).agg(
      avg(pow(col(predCol).cast("double") -
        col(targetCol).cast("double"), 2.0)).as("__mse"))
    val sp = spearmanBinned(df, predCol, targetCol, groupCols, bins)
    val joined =
      if (groupCols.isEmpty) mse.crossJoin(sp)
      else mse.join(sp, groupCols)
    joined.select(part :+
      (lit(mseWeight) * col("__mse")
        + lit(spearmanWeight) * -col("spearman")).as("combined_loss"): _*)
  }

  /** R² = 1 − SS_res/SS_tot per group (sklearn definition, used by the
    * reference's score(); keras_cortex.py:103). SS_tot via the algebraic
    * identity Σ(y−ȳ)² = Σy² − n·ȳ² so it needs a single aggregation
    * pass (map-side partial aggregation, one tiny shuffle). */
  def r2(df: DataFrame, predCol: String, targetCol: String,
      groupCols: Seq[String]): DataFrame = {
    val p = col(predCol); val y = col(targetCol)
    val gb = if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    gb.agg(sum(pow(y - p, 2.0)).as("__ssres"), sum(pow(y, 2.0)).as("__ssy"),
        avg(y).as("__my"), count(lit(1)).as("__n"))
      .select((groupCols.map(col) :+
        (lit(1.0) - col("__ssres") /
          (col("__ssy") - col("__n") * col("__my") * col("__my"))).as("r2")): _*)
  }
}
