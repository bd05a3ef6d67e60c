package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weights of a linear bottleneck encoder/decoder + prediction head —
  * plain arrays so they broadcast cheaply and pin into literal columns. */
case class BottleneckWeights(
    means: Array[Double],                 // per-feature centering
    loadings: Array[Array[Double]],       // [nFeatures][latentDim]
    head: Array[Double],                  // latent → target (linear)
    headBias: Double) extends Serializable {
  def nFeatures: Int = means.length
  def latentDim: Int = head.length
}

/** Behavioral analog of the reference's BottleneckEncoder
  * (keras_estimators/autoencoder.py:10-161): learn a low-dimensional
  * bottleneck of the features, expose the latent codes (`latent_{i}`),
  * the reconstruction (`recon_{i}`) and a target prediction
  * (`prediction`) trained THROUGH the bottleneck.
  *
  * Spark-first mapping (SURVEY.md §2.7): the denoising-autoencoder
  * bottleneck becomes exact covariance PCA (the optimal linear
  * autoencoder — minimizes the same reconstruction MSE the reference's
  * `reconstruction` head is trained on); the supervised head becomes a
  * least-squares solve on the latent codes. Fit aggregates only k×k Gram
  * matrices cluster-side (treeAggregate shape — data never leaves the
  * executors); transform/reconstruct/predict are pure codegen'd column
  * arithmetic from broadcast weights — map-side at scan speed, the exact
  * pattern of MLPRegressor scoring.
  */
case class BottleneckEncoder(
    featureCols: Seq[String],
    latentDim: Int,
    targetCol: Option[String] = None) {

  def fit(df: DataFrame): BottleneckModel = {
    val va = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    val pca = new PCA().setInputCol("__features").setOutputCol("__pca")
      .setK(latentDim)
    val clean = df.na.drop(featureCols)
    val assembled = va.transform(clean)
    val model = pca.fit(assembled)
    val k = featureCols.size
    // principal axes: spark.ml pc is [nFeatures][k] column-major
    val pc = model.pc.toArray
    val loadings = Array.tabulate(k, latentDim)((f, i) => pc(i * k + f))
    val meansRow = clean.agg(avg(col(featureCols.head)),
      featureCols.tail.map(c => avg(col(c))): _*).collect()(0)
    val means = Array.tabulate(k)(meansRow.getDouble)

    val head = targetCol match {
      case None => (new Array[Double](latentDim), 0.0)
      case Some(y) =>
        // least squares latent→target from aggregated Gram sums: latent
        // codes are linear in x, so Z'Z and Z'y aggregate in one pass
        val w0 = BottleneckWeights(means, loadings,
          new Array[Double](latentDim), 0.0)
        val feats = featureCols.map(c => col(c).cast("double"))
        val z = (0 until latentDim).map(i =>
          BottleneckEncoder.latentCol(w0, feats, i).as(s"__z$i"))
        val zy = df.na.drop(featureCols :+ y)
          .select(z :+ col(y).cast("double").as("__y"): _*)
        val sums: Seq[Column] =
          (for { a <- 0 until latentDim; b <- a until latentDim }
            yield sum(col(s"__z$a") * col(s"__z$b"))) ++
          (0 until latentDim).map(i => sum(col(s"__z$i") * col("__y"))) ++
          Seq(sum(col("__y")), count(lit(1))) ++
          (0 until latentDim).map(i => sum(col(s"__z$i")))
        val r = zy.agg(sums.head, sums.tail: _*).collect()(0)
        var off = 0
        val g = DenseMatrix.zeros[Double](latentDim + 1, latentDim + 1)
        for { a <- 0 until latentDim; b <- a until latentDim } {
          g(a, b) = r.getDouble(off); g(b, a) = r.getDouble(off); off += 1
        }
        val c0 = DenseVector.zeros[Double](latentDim + 1)
        for (i <- 0 until latentDim) { c0(i) = r.getDouble(off); off += 1 }
        c0(latentDim) = r.getDouble(off); off += 1
        val n = r.getLong(off).toDouble; off += 1
        for (i <- 0 until latentDim) {
          g(i, latentDim) = r.getDouble(off)
          g(latentDim, i) = r.getDouble(off); off += 1
        }
        g(latentDim, latentDim) = n
        // symmetric Gram system — bounded Jacobi solver, not LAPACK pinv
        // (column-major flat data is fine: g is symmetric)
        val sol = DenseVector(graft.solvers.SymSolve.pinvSolve(
          g.toArray, c0.toArray, latentDim + 1))
        (Array.tabulate(latentDim)(sol(_)), sol(latentDim))
    }
    BottleneckModel(BottleneckWeights(means, loadings, head._1, head._2),
      featureCols)
  }
}

case class BottleneckModel(weights: BottleneckWeights,
    featureCols: Seq[String]) extends ModelEstimator {
  def familyName: String = "bottleneck"
  // predict leaves the latent surface in the frame (transform + head)
  def predictionNames: Seq[String] =
    (0 until weights.latentDim).map(i => s"latent_$i") :+ "prediction"

  private def feats = featureCols.map(c => col(c).cast("double"))

  /** Appends `latent_{i}` (the reference encoder's output surface). */
  def transform(df: DataFrame): DataFrame =
    df.select(df.columns.map(col) ++ (0 until weights.latentDim).map(i =>
      BottleneckEncoder.latentCol(weights, feats, i).as(s"latent_$i")): _*)

  /** Appends `recon_{i}` — decoder = loadingsᵀ (orthonormal axes). Latent
    * codes are materialized as named intermediates first, so each recon
    * column references them once (no expression duplication). */
  def reconstruct(df: DataFrame): DataFrame = {
    val withZ = transform(df)
    val z = (0 until weights.latentDim).map(i => col(s"latent_$i"))
    withZ.select(withZ.columns.map(col) ++
      featureCols.indices.map(f =>
        BottleneckEncoder.reconCol(weights, z, f).as(s"recon_$f")): _*)
  }

  /** Appends `prediction` (naming contract keras_estimators/base.py:137-150). */
  def predict(df: DataFrame): DataFrame = {
    val withZ = transform(df)
    val z = (0 until weights.latentDim).map(i => col(s"latent_$i"))
    withZ.withColumn("prediction",
      BottleneckEncoder.headCol(weights, z))
  }

  /** The fitted payload (means, loadings, head) — exact-double JSON,
    * [[BottleneckModel.load]] scores bit-identically. */
  def saveParts: (Map[String, String], Seq[(String, Array[Double])]) =
    (Map(
      "family" -> "bottleneck",
      "features" -> WeightsIO.namesToMeta(featureCols),
      "latentDim" -> weights.latentDim.toString),
      Seq("means" -> weights.means,
        "loadings" -> WeightsIO.fromMat(weights.loadings),
        "head" -> weights.head,
        "headBias" -> Array(weights.headBias)))

  def save(path: String): Unit = {
    val (m, s) = saveParts
    WeightsIO.save(path, m, s)
  }
}

object BottleneckModel {
  /** Rehydrate a `save`d model (shape-validated). */
  def load(path: String): BottleneckModel = {
    val (meta, sections) = WeightsIO.load(path)
    fromParts(meta, sections, path)
  }

  /** Rebuild from an already-parsed payload (standalone or
    * pipeline-embedded). */
  def fromParts(meta: Map[String, String],
      sections: Map[String, Array[Double]], where: String)
      : BottleneckModel = {
    WeightsIO.requireFamily(meta, "bottleneck", where)
    val featureCols = WeightsIO.namesFromMeta(meta("features"))
    val k = featureCols.size
    val latent = meta("latentDim").toInt
    WeightsIO.requireLen("means", sections("means"), k)
    WeightsIO.requireLen("loadings", sections("loadings"), k * latent)
    WeightsIO.requireLen("head", sections("head"), latent)
    BottleneckModel(BottleneckWeights(sections("means"),
      WeightsIO.toMat(sections("loadings"), k),
      sections("head"), sections("headBias")(0)), featureCols)
  }
}

object BottleneckEncoder {
  /** latent_i = Σ_f (x_f − mean_f)·W[f][i], left-associated (the SQL
    * mirror uses the identical order). */
  def latentCol(w: BottleneckWeights, feats: Seq[Column], i: Int): Column =
    feats.zipWithIndex.map { case (f, j) =>
      (f - lit(w.means(j))) * lit(w.loadings(j)(i))
    }.reduce(_ + _)

  def latentSql(w: BottleneckWeights, featExprs: Seq[String], i: Int): String =
    featExprs.zipWithIndex.map { case (f, j) =>
      s"($f - ${w.means(j)}) * ${w.loadings(j)(i)}"
    }.mkString(" + ")

  /** recon_f = mean_f + Σ_i z_i·W[f][i]. */
  def reconCol(w: BottleneckWeights, z: Seq[Column], f: Int): Column =
    lit(w.means(f)) + (0 until w.latentDim).map(i =>
      z(i) * lit(w.loadings(f)(i))).reduce(_ + _)

  def reconSql(w: BottleneckWeights, zExprs: Seq[String], f: Int): String =
    s"${w.means(f)} + " + (0 until w.latentDim).map(i =>
      s"${zExprs(i)} * ${w.loadings(f)(i)}").mkString(" + ")

  def headCol(w: BottleneckWeights, z: Seq[Column]): Column =
    (0 until w.latentDim).map(i => z(i) * lit(w.head(i)))
      .reduce(_ + _) + lit(w.headBias)

  def headSql(w: BottleneckWeights, zExprs: Seq[String]): String =
    (0 until w.latentDim).map(i => s"${zExprs(i)} * ${w.head(i)}")
      .mkString(" + ") + s" + ${w.headBias}"
}
