package graft.operators

import org.apache.spark.sql.DataFrame
import graft.ml.ModelEstimator

/** A FITTED estimator as a pipeline stage — the reference's
  * `make_pipeline(transformers..., MLPRegressor())` shape
  * (README.md:117-162), where the final sklearn step both scores and
  * travels inside the pickled pipeline. Wrapping keeps GraftTransformer
  * the single composition surface: `transform` scores (the fitted
  * estimator's `predict`), `outputNames` is the prediction-column
  * contract, and PipelineIO persists the whole chain — feature stages
  * by configuration, this stage by its embedded WeightsIO payload — as
  * ONE artifact. */
case class ModelStage(model: ModelEstimator) extends GraftTransformer {
  def transform(df: DataFrame): DataFrame = model.predict(df)
  def outputNames: Seq[String] = model.predictionNames
}
