package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global z-score standardization (x − μ)/σ with stored statistics —
  * the reference's target-scaling step (StandardScaler default on
  * Keras-estimator targets, keras_estimators/base.py:89-100, inverse at
  * :129-130). One scalar aggregate (map-side partial), broadcast back;
  * no global window.
  */
case class StandardScaler(featureCols: Seq[String], suffix: String = "_std")
    extends GraftTransformer {
  def outputNames: Seq[String] = featureCols.map(f => s"$f$suffix")
  def transform(df: DataFrame): DataFrame = {
    val aggs = featureCols.flatMap(f =>
      Seq(avg(col(f)).as(s"__mu_$f"), stddev_pop(col(f)).as(s"__sd_$f")))
    val scalars = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(scalars))
    val outs = featureCols.map { f =>
      ((col(f) - col(s"__mu_$f")) / col(s"__sd_$f")).as(s"$f$suffix")
    }
    joined.select(df.columns.map(col) ++ outs: _*)
  }
}

/** Lag-matrix → sequence-tensor reshape contract of the reference's
  * sequence estimators (keras_estimators/sequence.py:26-40): columns
  * ordered lag-major (the LagTransformer output order, windows
  * descending) become a nested array [seq_len][features_per_step], i.e.
  * one timestep per lag window. Spark-native representation:
  * ArrayType(ArrayType(Double)) column, consumed by scoring UDFs of
  * sequence models. */
object SequenceReshape {
  import org.apache.spark.sql.Column
  def toSequenceTensor(lagCols: Seq[String], seqLen: Int): Column = {
    require(lagCols.size % seqLen == 0,
      s"${lagCols.size} lag columns do not reshape into $seqLen steps")
    val perStep = lagCols.size / seqLen
    array(lagCols.grouped(perStep).map(step =>
      array(step.map(c => col(c).cast("double")): _*)).toSeq: _*)
  }
}
