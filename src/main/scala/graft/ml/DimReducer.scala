package graft.ml

import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.GraftTransformer

/** PCA dimensionality reduction with the reference's output contract
  * `dim_{i}` (DimReducer, dimreduction.py:11-164; only the pca method maps
  * exactly — t-SNE/UMAP have no distributed analog and are documented out
  * of scope, SURVEY.md §2.7).
  *
  * spark.ml PCA = exact covariance PCA (Gram matrix via one
  * treeAggregate, eigendecomposition on the driver) — the right scale
  * shape: data never leaves the cluster, only the k×k Gram does.
  */
case class DimReducer(featureCols: Seq[String], nComponents: Int)
    extends GraftTransformer {
  def outputNames: Seq[String] = (0 until nComponents).map(i => s"dim_$i")
  def transform(df: DataFrame): DataFrame = fitTransform(df)
  def fitTransform(df: DataFrame): DataFrame = {
    val va = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    val pca = new PCA().setInputCol("__features").setOutputCol("__pca")
      .setK(nComponents)
    val assembled = va.transform(df)
    val model = pca.fit(assembled)
    val toArr = udf((v: Vector) => v.toArray)
    model.transform(assembled)
      .withColumn("__arr", toArr(col("__pca")))
      .select(df.columns.map(col) ++
        (0 until nComponents).map(i =>
          element_at(col("__arr"), i + 1).as(s"dim_$i")): _*)
  }
}

/** Regression metrics (reference §2.8): exact Spearman (rank-then-Pearson)
  * and R². */
object Metrics {

  /** Spearman rank correlation between two columns per group (exact form
    * of the reference's differentiable SpearmanCorrelation loss,
    * losses.py:22-122). */
  def spearman(df: DataFrame, a: String, b: String,
      groupCols: Seq[String]): DataFrame = {
    import graft.functions.avgRank
    val part = groupCols.map(col)
    val ranked = df.select(part ++ Seq(
      avgRank(col(a), part).as("__ra"), avgRank(col(b), part).as("__rb")): _*)
    ranked.groupBy(part: _*).agg(corr(col("__ra"), col("__rb")).as("spearman"))
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
