package graft.ml



import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.GraftTransformer

/** PCA dimensionality reduction with the reference's output contract
  * `dim_{i}` (DimReducer, dimreduction.py:11-164). The sibling methods
  * map elsewhere: t-SNE → [[Tsne]] (bounded-sample driver fit, the
  * reference's refit-per-call contract), UMAP → [[UmapAnalog]] (the
  * deterministic distributed LargeVis/UMAP-family batch form).
  *
  * Exact covariance PCA with the right scale shape: ONE aggregation pass
  * reduces the data to the k(k+3)/2 raw moments (map-side partial
  * aggregation; only the tiny Gram reaches the driver), the k×k
  * eigenproblem solves on the driver with the bounded Jacobi solver
  * (solvers.SymSolve — no LAPACK, see there), and the projection is a
  * codegen'd literal-loadings expression. Replaces the earlier
  * MLlib PCA + VectorAssembler + UDF route: same mathematics, no
  * per-row Vector boxing, no UDF in the scoring path, and projections
  * are CENTERED (x−μ)·v (sklearn semantics, matching the reference).
  * Component sign is pinned deterministically: the largest-magnitude
  * loading of each component is positive.
  */
case class DimReducer(featureCols: Seq[String], nComponents: Int)
    extends GraftTransformer {
  require(nComponents >= 1 && nComponents <= featureCols.size,
    s"nComponents=$nComponents for ${featureCols.size} features")
  def outputNames: Seq[String] = (0 until nComponents).map(i => s"dim_$i")
  def transform(df: DataFrame): DataFrame = fitTransform(df)

  /** (means, loadings) — loadings(j) = eigenvector of the j-th largest
    * eigenvalue of the sample covariance. */
  def fit(df: DataFrame): (Array[Double], Array[Array[Double]]) = {
    val k = featureCols.size
    val cols = featureCols.map(f => col(f).cast("double"))
    val moments =
      (count(lit(1)).cast("double").as("__n") +:
        cols.zipWithIndex.map { case (c, i) => sum(c).as(s"__s$i") }) ++
        (for (i <- 0 until k; j <- i until k)
          yield sum(cols(i) * cols(j)).as(s"__ss${i}_$j"))
    val r = df.agg(moments.head, moments.tail: _*).collect()(0)
    val n = r.getAs[Double]("__n")
    val means = Array.tabulate(k)(i => r.getAs[Double](s"__s$i") / n)
    val cov = new Array[Double](k * k)
    for (i <- 0 until k; j <- i until k) {
      val c = r.getAs[Double](s"__ss${i}_$j") / n - means(i) * means(j)
      cov(i * k + j) = c; cov(j * k + i) = c
    }
    val (w, v) = graft.solvers.SymSolve.eigSym(cov, k)
    val order = w.indices.sortBy(i => -w(i))
    val loadings = order.take(nComponents).map { ei =>
      val vec = Array.tabulate(k)(r => v(r * k + ei))
      // deterministic sign: largest-|loading| coordinate positive
      val m = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(m) < 0) vec.map(x => -x) else vec
    }.toArray
    (means, loadings)
  }

  def fitTransform(df: DataFrame): DataFrame = {
    val (means, loadings) = fit(df)
    project(df, means, loadings)
  }

  /** Centered projection (x − μ)·v through LITERAL means/loadings —
    * left-associated fold, so the per-row arithmetic is bit-identical
    * to a SQL mirror built from the same literals. */
  def project(df: DataFrame, means: Array[Double],
      loadings: Array[Array[Double]]): DataFrame = {
    val centered = featureCols.zip(means).map { case (f, m) =>
      col(f).cast("double") - lit(m)
    }
    val dims = loadings.zipWithIndex.map { case (load, di) =>
      centered.zip(load).map { case (c, l) => c * lit(l) }
        .reduceLeft(_ + _).as(s"dim_$di")
    }
    df.select(df.columns.map(col) ++ dims: _*)
  }
}

/** Closed-form 2-feature PCA: the 2×2 covariance eigenproblem has the
  * analytic solution θ = ½·atan2(2·c_xy, c_xx − c_yy) (major-axis angle
  * of the covariance ellipse), so fit AND transform are one scalar
  * aggregate + a broadcast projection — no MLlib, no driver eigensolver,
  * and a DETERMINISTIC sign convention (θ ∈ (−π/2, π/2] ⇒ the first
  * component's x-coordinate is non-negative), which makes the whole fit
  * SQL-mirrorable (q_pca2) where general seeded PCA is rows-only. */
object ClosedFormPCA {
  def pca2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val stats = df.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
      sum(x * y).as("__sxy"))
    val mx = col("__sx") / col("__n"); val my = col("__sy") / col("__n")
    val cxx = col("__sxx") / col("__n") - mx * mx
    val cyy = col("__syy") / col("__n") - my * my
    val cxy = col("__sxy") / col("__n") - mx * my
    val theta = lit(0.5) * atan2(lit(2.0) * cxy, cxx - cyy)
    df.crossJoin(broadcast(stats))
      .withColumn("dim_0",
        (x - mx) * cos(theta) + (y - my) * sin(theta))
      .withColumn("dim_1",
        (y - my) * cos(theta) - (x - mx) * sin(theta))
      .drop("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")
  }
}
