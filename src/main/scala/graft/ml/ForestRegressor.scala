package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analog of the reference's NeuralDecisionForest
  * (keras_estimators/tree.py:53-384): an ensemble of depth-bounded trees
  * whose averaged leaf values predict the target, with the
  * `prediction` output contract (keras_estimators/base.py:137-150).
  *
  * Spark-first mapping (SURVEY.md §2.7): the soft/differentiable routing
  * of the NDF exists to make trees trainable by SGD — the model CLASS
  * (axis-aligned splits → leaf values → ensemble average) is a random
  * forest, so the analog wraps `ml.regression.RandomForestRegressor`
  * (distributed histogram-based training; scoring broadcasts the tiny
  * tree ensemble and runs map-side). */
case class ForestRegressor(
    featureCols: Seq[String],
    targetCol: String,
    numTrees: Int = 20,
    maxDepth: Int = 5,
    seed: Long = 42L) {

  def fit(df: DataFrame): ForestModel = {
    val va = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    val rf = new RandomForestRegressor().setFeaturesCol("__features")
      .setLabelCol(targetCol).setNumTrees(numTrees).setMaxDepth(maxDepth)
      .setSeed(seed).setPredictionCol("prediction")
    ForestModel(rf.fit(va.transform(df.na.drop(featureCols :+ targetCol))),
      featureCols)
  }
}

case class ForestModel(model: RandomForestRegressionModel,
    featureCols: Seq[String]) {
  /** Appends `prediction`. */
  def predict(df: DataFrame): DataFrame = {
    val va = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    model.transform(va.transform(df)).drop("__features")
  }
}

/** Pinned decision trees as pure `when`-chains — the deterministic
  * scoring path (the q_mlp_score pattern applied to trees): a literal
  * ensemble becomes codegen'd CASE arithmetic with a line-for-line SQL
  * mirror, so forest scoring plumbing verifies against the DuckDB oracle
  * even though seeded distributed training does not. */
object PinnedTrees {
  sealed trait TreeNode
  /** Left branch when `col(feature) < threshold` (nulls go right, both
    * engines: a null comparison is not TRUE). */
  case class Split(feature: String, threshold: Double, left: TreeNode,
      right: TreeNode) extends TreeNode
  case class Leaf(value: Double) extends TreeNode

  def toColumn(t: TreeNode): Column = t match {
    case Leaf(v) => lit(v)
    case Split(f, thr, l, r) =>
      when(col(f) < lit(thr), toColumn(l)).otherwise(toColumn(r))
  }

  def toSql(t: TreeNode): String = t match {
    case Leaf(v) => v.toString
    case Split(f, thr, l, r) =>
      s"(CASE WHEN $f < $thr THEN ${toSql(l)} ELSE ${toSql(r)} END)"
  }

  /** Ensemble average, left-associated like the SQL mirror. */
  def forestColumn(trees: Seq[TreeNode]): Column =
    trees.map(toColumn).reduce(_ + _) / lit(trees.size.toDouble)

  def forestSql(trees: Seq[TreeNode]): String =
    trees.map(toSql).mkString("(", " + ", s") / ${trees.size.toDouble}")
}
