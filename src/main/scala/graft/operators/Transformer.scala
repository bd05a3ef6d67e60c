package graft.operators

import org.apache.spark.sql.DataFrame

/** A `DataFrame => DataFrame` pipeline stage.
  *
  * Spark-native re-expression of the reference's sklearn-transformer +
  * metadata-routing composition (reference: README.md:112-162,
  * feature_transformers/base.py:41-80): the routed side-channel series
  * (`date_series`, `ticker_series`, `era_series`) become *named columns in
  * the same DataFrame*, passed as constructor parameters. Ordering, which
  * the reference inherits implicitly from physical row order, is an explicit
  * `orderCols` parameter — Spark DataFrames are unordered by design.
  *
  * `transform` appends the transformer's output columns to the input frame
  * (the reference returns only the new columns; keeping the input columns
  * is strictly more composable and costs nothing under column pruning).
  * `outputNames` mirrors the reference's `get_feature_names_out`.
  */
trait GraftTransformer extends Serializable {
  def transform(df: DataFrame): DataFrame
  def outputNames: Seq[String]
}

/** Sequential composition of transformers — the whole chain stays one lazy
  * Catalyst plan, so adjacent stages sharing a partitioning key (e.g. lag +
  * moving-average over the same ticker/order spec) get a single exchange. */
case class Pipeline(stages: Seq[GraftTransformer]) extends GraftTransformer {
  def transform(df: DataFrame): DataFrame = stages.foldLeft(df)((d, t) => t.transform(d))
  def outputNames: Seq[String] = stages.flatMap(_.outputNames)
}
