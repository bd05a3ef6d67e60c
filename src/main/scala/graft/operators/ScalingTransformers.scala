package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Global min-max scaling to [0, 1] with the reference's degenerate-range
  * guard ((max-min) < 1e-10 → 0.5; reference base.py:17-23).
  *
  * Scale design: the min/max are computed with a single all-reduce
  * aggregate (map-side partial aggregation, one tiny exchange) and joined
  * back via a broadcast cross join of the 1-row scalar frame — NOT an empty
  * window spec, which would funnel 100 TB through one partition.
  */
case class MinMaxScaler(featureCols: Seq[String], suffix: String = "_scaled")
    extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"$f$suffix")
  def transform(df: DataFrame): DataFrame = {
    val aggs = featureCols.flatMap(f =>
      Seq(min(col(f)).as(s"__min_$f"), max(col(f)).as(s"__max_$f")))
    val scalars = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(scalars))
    val outs = featureCols.map { f =>
      minMaxScale(col(f), col(s"__min_$f"), col(s"__max_$f")).as(s"$f$suffix")
    }
    joined.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Per-era gaussianization: ordinal rank → (r - 0.5)/n → Φ⁻¹.
  *
  * Reference: `_gaussianize` (base.py:10-14) uses
  * `scipy.stats.rankdata(method="ordinal")`, whose tie order is input row
  * order. Spark has no physical row order, so ties are broken by
  * `tiebreakCols` — a deterministic unique key. This is the documented
  * semantic deviation (SURVEY.md §7.4.3): identical output on tie-free
  * data, deterministic (rather than order-dependent) output on ties.
  *
  * One exchange on `eraCol`; row_number + count share it. Φ⁻¹ is a
  * codegen'd native expression, so the whole operator is one shuffle and
  * stays inside WholeStageCodegen.
  */
case class Gaussianizer(
    featureCols: Seq[String],
    eraCol: String,
    tiebreakCols: Seq[String],
    suffix: String = "_gauss") extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"$f$suffix")
  def transform(df: DataFrame): DataFrame = {
    val outs = featureCols.map { f =>
      val w = Window.partitionBy(eraCol)
        .orderBy(col(f) +: tiebreakCols.map(col): _*)
      val n = count(lit(1)).over(Window.partitionBy(eraCol))
      val p = (row_number().over(w).cast("double") - 0.5) / n
      inv_norm_cdf(p).as(s"$f$suffix")
    }
    df.select(df.columns.map(col) ++ outs: _*)
  }
}
