package graft.solvers

import breeze.linalg.{DenseMatrix, DenseVector, norm, sum}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.GraftTransformer

/** Feature penalization: per era, learn (by Adamax gradient descent) the
  * minimal linear adjustment `pred - feats @ w` that caps every feature
  * exposure at `maxExposure`, preserving more signal than proportional
  * neutralization.
  *
  * Faithful re-derivation of the reference's JAX implementation
  * (penalization.py:233-303): features are shifted by -0.5 (:247),
  * target exposures are the clamp of the initial exposures (:251),
  * loss = Σ relu-excess over the target (:261-266), Adamax with
  * β₁=0.9 β₂=0.999 ε=1e-7 (:268-279), stop when loss < tol or
  * max_iters (:253-258). The JAX `jit`/`while_loop` becomes a plain Scala
  * loop — the JVM JIT covers it — and the analytic gradient replaces
  * autodiff (chain rule through the normalized-correlation exposure).
  *
  * Era-level parallelism across the cluster via groupByKey(era), one
  * exchange; the reference parallelizes the same loop with joblib
  * (penalization.py:170-188).
  *
  * Output columns: `{pred}_penalized_{maxExp}[_{suffix}]`
  * (penalization.py:116-124).
  */
case class FeaturePenalizer(
    predCols: Seq[String],
    featureCols: Seq[String],
    maxExposures: Seq[Double] = Seq(0.1),
    eraCol: String = "era",
    idCol: String = "id",
    suffix: Option[String] = None,
    lr: Double = 1e-3,
    maxIters: Int = 100000,
    tol: Double = 1e-7) extends GraftTransformer {
  require(maxExposures.forall(e => e >= 0 && e <= 1),
    s"max_exposure should be in [0, 1]. Got $maxExposures.")
  require(predCols.distinct == predCols, "Duplicate pred_names found.")

  def outputNames: Seq[String] = for (p <- predCols; e <- maxExposures)
    yield suffix.fold(s"${p}_penalized_$e")(sfx => s"${p}_penalized_${e}_$sfx")

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nOut = outputNames.size
    val exps = maxExposures.toArray
    val (lr0, iters0, tol0) = (lr, maxIters, tol)

    val packed: Dataset[(Long, String, Array[Double], Array[Double])] = df.select(
      col(idCol).cast("long"),
      col(eraCol).cast("string"),
      array(predCols.map(c => col(c).cast("double")): _*),
      array(featureCols.map(c => col(c).cast("double")): _*)
    ).as[(Long, String, Array[Double], Array[Double])]

    val solved = packed
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val (ids, preds, x0) = EraSolver.collectEra(it)
        val m = ids.length
        val feats = x0 - 0.5 // reference penalization.py:247
        val outs = Array.ofDim[Double](m, nOut)
        var o = 0
        for (pi <- predCols.indices) {
          val gauss = EraSolver.gaussianize(
            Array.tabulate(m)(i => preds(i)(pi)), ids)
          val pred = DenseVector(gauss)
          for (maxExp <- exps) {
            val pen = Penalize.reduceExposure(pred, feats, maxExp, lr0,
              iters0, tol0)
            val std = EraSolver.popStd(pen)
            var i = 0
            while (i < m) { outs(i)(o) = pen(i) / std; i += 1 }
            o += 1
          }
        }
        Iterator.range(0, m).map(i => (ids(i), outs(i)))
      }
      .toDF(idCol, "__outs")

    // Output names may contain dots (e.g. _neutralized_0.5) — reference
    // them with backquotes so Column parsing keeps them atomic.
    def q(n: String) = col(s"`$n`")
    val unpacked = solved.select(
      col(idCol) +: outputNames.zipWithIndex.map { case (n, i) =>
        element_at(col("__outs"), i + 1).as(n)
      }: _*)
    val aggs = outputNames.flatMap(n =>
      Seq(min(q(n)).as(s"__mn_$n"), max(q(n)).as(s"__mx_$n")))
    val scalars = unpacked.agg(aggs.head, aggs.tail: _*)
    val scaled = unpacked.crossJoin(broadcast(scalars)).select(
      col(idCol) +: outputNames.map { n =>
        graft.functions.minMaxScale(q(n), q(s"__mn_$n"), q(s"__mx_$n")).as(n)
      }: _*)
    df.join(scaled, Seq(idCol))
  }
}

private[solvers] object Penalize {

  /** Column-standardized feature matrix: each column centered and unit-norm
    * (reference `_exposures`, penalization.py:296-303). */
  private def normalizeCols(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = x.copy
    var j = 0
    while (j < x.cols) {
      val c = out(::, j)
      val mean = sum(c) / c.length
      c -= mean
      val n = norm(c)
      if (n > 0) c /= n
      j += 1
    }
    out
  }

  private def relu(v: Double): Double = if (v > 0) v else 0.0

  /** Adamax loop of penalization.py:253-294 with the analytic gradient.
    *
    * loss(w) = Σ_j relu(relu(e_j) − relu(t_j)) + relu(relu(−e_j) − relu(−t_j))
    * where e = X̂ᵀ ŷ(w), ŷ = centered+unit-norm (pred − X w).
    * d loss/d e_j = [e_j>0 ∧ e_j>relu(t_j)] − [−e_j>0 ∧ −e_j>relu(−t_j)];
    * back through ŷ: u = (X̂ g − ŷ (ŷᵀ X̂ g)) / ‖c‖, then center u;
    * d loss/d w = −Xᵀ u.
    */
  def reduceExposure(
      pred: DenseVector[Double],
      feats: DenseMatrix[Double],
      maxExp: Double,
      lr: Double,
      maxIters: Int,
      tol: Double): DenseVector[Double] = {
    val k = feats.cols
    val xhat = normalizeCols(feats)

    def exposures(y: DenseVector[Double]): DenseVector[Double] = {
      val c = y.copy
      val mean = sum(c) / c.length
      c -= mean
      val n = norm(c)
      if (n > 0) c /= n
      xhat.t * c
    }

    val target = exposures(pred).map(e =>
      math.max(-maxExp, math.min(maxExp, e)))
    val reluT = target.map(relu)
    val reluNegT = target.map(t => relu(-t))

    val w = DenseVector.zeros[Double](k)
    val mom = DenseVector.zeros[Double](k)
    val inf = DenseVector.zeros[Double](k)
    val beta1 = 0.9; val beta2 = 0.999; val eps = 1e-7
    var t = 0
    var loss = Double.PositiveInfinity
    while (loss >= tol && t < maxIters) {
      val neut = pred - feats * w
      val c = neut.copy
      val mean = sum(c) / c.length
      c -= mean
      val cn = norm(c)
      val yhat = if (cn > 0) c / cn else c
      val e = xhat.t * yhat
      // loss and dloss/de
      var l = 0.0
      val g = DenseVector.zeros[Double](k)
      var j = 0
      while (j < k) {
        val pos = relu(relu(e(j)) - reluT(j))
        val neg = relu(relu(-e(j)) - reluNegT(j))
        l += pos + neg
        g(j) = (if (e(j) > 0 && pos > 0) 1.0 else 0.0) -
          (if (-e(j) > 0 && neg > 0) 1.0 else 0.0)
        j += 1
      }
      loss = l
      if (loss >= tol) {
        val v = xhat * g                       // dloss/d ŷ
        val u = (v - yhat * (yhat dot v)) / cn // through normalization
        val um = sum(u) / u.length
        val grads = -(feats.t * u.map(_ - um)) // through centering + X w
        // Adamax update (penalization.py:268-279)
        mom := mom * beta1 + grads * (1 - beta1)
        var jj = 0
        while (jj < k) {
          inf(jj) = math.max(beta2 * inf(jj), math.abs(grads(jj)))
          jj += 1
        }
        val mhat = mom / (1 - math.pow(beta1, t + 1.0))
        var jjj = 0
        while (jjj < k) {
          w(jjj) -= lr * mhat(jjj) / (inf(jjj) + eps)
          jjj += 1
        }
        t += 1
      }
    }
    pred - feats * w
  }
}
