package graft.solvers

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.InverseNormalCdf
import graft.operators.GraftTransformer

/** Shared plumbing for the per-era solvers (neutralizer / penalizer).
  *
  * Physical design: one hash exchange on the era key
  * (`Dataset.groupByKey(era).flatMapGroups`), each era solved in-memory on
  * one task with Breeze, results joined back to the input on the caller's
  * unique `idCol`. Eras parallelize across the cluster (finer granularity
  * than the reference's joblib-over-(pred,prop) tasks,
  * neutralization.py:159-177). Memory bound = rows(largest era) ×
  * (#preds + #features) × 8B — panel eras are thousands of rows, i.e. KBs.
  *
  * The reference's `_gaussianize` (base.py:10-14) uses ordinal ranks whose
  * tie order is physical row order; here ties break deterministically on
  * `idCol` (SURVEY.md §7.4.3).
  */
private[solvers] object EraSolver {

  /** (id, gaussianized pred, feature matrix row) for one era. */
  type EraRow = (Long, Array[Double], Array[Double])

  def gaussianize(values: Array[Double], ids: Array[Long]): Array[Double] = {
    val n = values.length
    val order = Array.range(0, n).sortBy(i => (values(i), ids(i)))
    val out = new Array[Double](n)
    var r = 0
    while (r < n) {
      out(order(r)) = InverseNormalCdf.compute((r + 1 - 0.5) / n)
      r += 1
    }
    out
  }

  def popStd(v: DenseVector[Double]): Double = {
    val m = breeze.linalg.sum(v) / v.length
    math.sqrt(v.valuesIterator.map(x => (x - m) * (x - m)).sum / v.length)
  }

  /** Collect an era iterator into (ids, preds matrix, features matrix). */
  def collectEra(it: Iterator[(Long, String, Array[Double], Array[Double])])
      : (Array[Long], Array[Array[Double]], DenseMatrix[Double]) = {
    val rows = it.toArray
    val ids = rows.map(_._1)
    val preds = rows.map(_._3)
    val m = rows.length
    val k = rows(0)._4.length
    val x = DenseMatrix.zeros[Double](m, k)
    var i = 0
    while (i < m) {
      val f = rows(i)._4
      var j = 0
      while (j < k) { x(i, j) = f(j); j += 1 }
      i += 1
    }
    (ids, preds, x)
  }

  /** Caches created by previous scaleGlobal invocations, released on the
    * next call: the projection branch still needs the cache when the
    * CALLER'S terminal action runs (we cannot unpersist synchronously),
    * but a long-lived session holding a new solver result per invocation
    * must not accumulate cached blocks — disk blocks are not
    * LRU-reclaimed. At most one solver cache stays live; users can also
    * release it eagerly via `GraftTransformer.unpersistAll()`. */
  private val liveCaches =
    graft.operators.GraftTransformer.newCacheQueue()

  /** Global (cross-era) min-max scale of the solver's `(id, outs array)`
    * output, returning `(idCol, out columns...)`.
    *
    * The solved frame feeds TWO plan branches (the scalar min/max aggregate
    * and the projection it scales) — persist it so the per-era solve runs
    * ONCE, not once per branch. The persisted unit is the solver's compact
    * output (id + k doubles per row), not the input. This is the standard
    * Spark shape for "aggregate then rescale the same data" second passes
    * (reference's global pass: neutralization.py:220-221).
    */
  def scaleGlobal(solved: DataFrame, idCol: String,
      outputNames: Seq[String]): DataFrame = {
    def q(n: String) = col(s"`$n`")
    liveCaches.release()
    val unpacked = liveCaches.keep(solved.select(
      col(idCol) +: outputNames.zipWithIndex.map { case (n, i) =>
        element_at(col("__outs"), i + 1).as(n)
      }: _*).persist(StorageLevel.MEMORY_AND_DISK))
    val aggs = outputNames.flatMap(n =>
      Seq(min(q(n)).as(s"__mn_$n"), max(q(n)).as(s"__mx_$n")))
    val scalars = unpacked.agg(aggs.head, aggs.tail: _*)
    unpacked.crossJoin(broadcast(scalars)).select(
      col(idCol) +: outputNames.map { n =>
        graft.functions.minMaxScale(q(n), q(s"__mn_$n"), q(s"__mx_$n")).as(n)
      }: _*)
  }
}

/** Classic feature neutralization: per era, gaussianize the prediction,
  * fit `pred ~ features` by least squares, subtract `proportion ×
  * (features @ coeffs)`, standardize by population std; finally min-max
  * scale each output column to [0,1] ACROSS all eras (the global second
  * pass, reference neutralization.py:197-248 and :220-221).
  *
  * Output columns: `{pred}_neutralized_{prop}[_{suffix}]`
  * (neutralization.py:93-101).
  *
  * @param idCol unique LongType row id — join-back key and gaussianize
  *              tiebreak (the engine never relies on physical row order).
  */
case class FeatureNeutralizer(
    predCols: Seq[String],
    featureCols: Seq[String],
    proportions: Seq[Double] = Seq(0.5),
    eraCol: String = "era",
    idCol: String = "id",
    suffix: Option[String] = None) extends GraftTransformer {
  require(proportions.forall(p => p >= 0 && p <= 1),
    s"proportion should be in [0, 1]. Got $proportions.")
  require(predCols.distinct == predCols, "Duplicate pred_names found.")

  def outputNames: Seq[String] = for (p <- predCols; prop <- proportions)
    yield suffix.fold(s"${p}_neutralized_$prop")(sfx => s"${p}_neutralized_${prop}_$sfx")

  def transform(df: DataFrame): DataFrame =
    df.join(outputsOnly(df), Seq(idCol))

  /** `(idCol, output columns...)` without joining back to the input —
    * callers that only consume the neutralized columns (plus the id) skip
    * a full-width sort-merge join this way. */
  def outputsOnly(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nOut = outputNames.size
    val props = proportions.toArray

    // reference: era_series=None treats the whole frame as one era
    // (neutralization.py:147-152) — here: eraCol = ""
    val eraExpr = if (eraCol.isEmpty) lit("__all__")
      else col(eraCol).cast("string")

    // Single-feature fast path: the no-intercept lstsq degenerates to
    // coef = Σxg/Σx², so EVERY step — gaussianize, fit, subtract,
    // standardize — is a window expression. Declaring it in Catalyst
    // (inv_norm_cdf is codegen'd) beats the typed groupByKey path by
    // ~5×: no row collection, no object (de)serialization, and the era
    // windows share one exchange. The general k-feature solve keeps the
    // flatMapGroups + Gram route below.
    if (featureCols.size == 1) {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.inv_norm_cdf
      val base = df.select(
        col(idCol).cast("long").as(idCol) +: eraExpr.as("__era") +:
          col(featureCols.head).cast("double").as("__x") +:
          predCols.map(p => col(p).cast("double").as(s"__p_$p")): _*)
      val wEra = Window.partitionBy(col("__era"))
      val n = count(lit(1)).over(wEra)
      val sxx = sum(col("__x") * col("__x")).over(wEra)
      var cur = base
      val outs = for (p <- predCols) yield {
        val wOrd = Window.partitionBy(col("__era"))
          .orderBy(col(s"__p_$p"), col(idCol))
        val g = inv_norm_cdf(
          (row_number().over(wOrd).cast("double") - 0.5) / n)
        cur = cur.withColumn(s"__g_$p", g)
        val coef = when(sxx > 0,
          sum(col("__x") * col(s"__g_$p")).over(wEra) / sxx).otherwise(0.0)
        for ((prop, pi) <- proportions.zipWithIndex) yield {
          val v = col(s"__g_$p") - (col("__x") * coef) * lit(prop)
          // index, not the proportion value, in the temp name: "0.5"
          // would read as a nested-field path in col()
          val vn = s"__v_${p}_$pi"
          cur = cur.withColumn(vn, v)
          col(vn) / stddev_pop(col(vn)).over(wEra)
        }
      }
      val solved = cur.select(col(idCol),
        array(outs.flatten: _*).as("__outs"))
      return EraSolver.scaleGlobal(solved, idCol, outputNames)
    }

    val packed: Dataset[(Long, String, Array[Double], Array[Double])] = df.select(
      col(idCol).cast("long"),
      eraExpr,
      array(predCols.map(c => col(c).cast("double")): _*),
      array(featureCols.map(c => col(c).cast("double")): _*)
    ).as[(Long, String, Array[Double], Array[Double])]

    val solved: DataFrame = packed
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val (ids, preds, x) = EraSolver.collectEra(it)
        val m = ids.length
        val outs = Array.ofDim[Double](m, nOut)
        var o = 0
        for (pi <- predCols.indices) {
          val gauss = EraSolver.gaussianize(
            Array.tabulate(m)(i => preds(i)(pi)), ids)
          val y = DenseVector(gauss)
          // lstsq via the Gram pseudo-inverse: (XᵀX)⁺Xᵀy equals the
          // minimum-norm SVD solution of np.linalg.lstsq
          // (neutralization.py:239) but only ever materializes k×k —
          // pinv(X) directly would build an m×m U factor per era.
          // k = 1 is a scalar divide; k > 1 solves the k×k Gram with the
          // bounded Jacobi solver (SymSolve) — no LAPACK in the task path
          // (the F2J fallback can hang non-deterministically, see SymSolve)
          val coeffs =
            if (x.cols == 1) {
              val g = x(::, 0) dot x(::, 0)
              val c = x(::, 0) dot y
              DenseVector(if (g > 0) c / g else 0.0)
            } else {
              val k = x.cols
              val g = new Array[Double](k * k)
              val b = new Array[Double](k)
              var r = 0
              while (r < m) {
                var a = 0
                while (a < k) {
                  val xa = x(r, a)
                  b(a) += xa * y(r)
                  var c = a
                  while (c < k) { g(a * k + c) += xa * x(r, c); c += 1 }
                  a += 1
                }
                r += 1
              }
              var a = 0
              while (a < k) {
                var c = a + 1
                while (c < k) { g(c * k + a) = g(a * k + c); c += 1 }
                a += 1
              }
              DenseVector(SymSolve.pinvSolve(g, b, k))
            }
          val exposure = x * coeffs
          for (prop <- props) {
            val neut = y - exposure * prop
            val std = EraSolver.popStd(neut)
            var i = 0
            while (i < m) { outs(i)(o) = neut(i) / std; i += 1 }
            o += 1
          }
        }
        Iterator.range(0, m).map(i => (ids(i), outs(i)))
      }
      .toDF(idCol, "__outs")

    // Global (cross-era) min-max per output column: tiny scalar aggregate,
    // broadcast back — second pass per SURVEY.md §7.4.4.
    EraSolver.scaleGlobal(solved, idCol, outputNames)
  }
}
