package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group equal-frequency discretization: bin a numeric column into
  * `k` quantile buckets (bin i covers (q_{i-1}, q_i]; bin 1 is
  * left-open), the standard feature-engineering step before target
  * encoding / monotone models, and the generic form of the head/middle/
  * tail split [[graft.text.LmBuckets]] hardcodes at k = 3.
  *
  * Plan shape: ONE exact-percentile aggregate per group — a groups-row
  * frame of k−1 cut points (map-side-partials via the primitive-buffer
  * [[graft.functions.ExactPercentiles]]) — broadcast back, then the bin
  * index is a scan-speed fold over the cuts array: 1 + |{cuts < x}|.
  * Never a window, never a global sort; the group cardinality (eras,
  * return flags) is the only scale axis of the cut frame. At 100 TB
  * swap the aggregate for `approx_percentile` exactly as the
  * winsorize/LmBuckets knobs document. Cuts and values are rounded to
  * 6 decimals before comparing, so bin boundaries are engine-stable
  * (the DuckDB oracle reproduces them bit-for-bit).
  *
  * Null values get a null bin. Constant groups collapse to one bin
  * (every cut equal → all values in bin 1 or k by the strict
  * comparison; pinned in the spec).
  *
  * Reference analog: the rank/gaussianize feature-transformer family
  * (feature_transformers/ranking.py, base.py) — binning is the
  * discrete member of that family; greenfield beyond it.
  */
case class QuantileBinner(valueCol: String, k: Int,
    groupCols: Seq[String] = Nil, out: String = "bin")
    extends GraftTransformer {
  require(k >= 2, s"need at least 2 bins: $k")

  def outputNames: Seq[String] = Seq(out)

  def transform(df: DataFrame): DataFrame = {
    val ps = (1 until k).map(_.toDouble / k)
    val v = graft.functions.FastRound(col(valueCol).cast("double"), 6)
    val cutsAgg = graft.functions.ExactPercentiles(v, ps).as("__qs")
    val cuts =
      (if (groupCols.isEmpty) df.agg(cutsAgg)
       else df.groupBy(groupCols.map(col): _*).agg(cutsAgg))
        .select((groupCols.map(col) :+
          transform_(col("__qs"))): _*)
    // null-SAFE equi-join (<=>): groupBy puts null keys in their own
    // group, so a null-keyed row must meet its own group's cuts row —
    // a plain equi-join would silently drop those rows from the output
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(cuts))
      else {
        val renamed = cuts.select(groupCols.zipWithIndex.map {
          case (g, i) => col(g).as(s"__g$i")
        } :+ col("__cuts"): _*)
        val cond = groupCols.zipWithIndex.map {
          case (g, i) => col(g) <=> col(s"__g$i")
        }.reduce(_ && _)
        df.join(broadcast(renamed), cond, "left")
      }
    val bin = when(col(valueCol).isNotNull,
      aggregate(col("__cuts"), lit(1),
        (acc, c) => acc + when(v > c, 1).otherwise(0)))
    joined.select(df.columns.toSeq.map(col(_)) :+ bin.as(out): _*)
  }

  // the class's transform(df) shadows functions.transform; qualify
  private def transform_(qs: Column): Column =
    org.apache.spark.sql.functions.transform(qs,
      q => graft.functions.FastRound(q, 6)).as("__cuts")
}
