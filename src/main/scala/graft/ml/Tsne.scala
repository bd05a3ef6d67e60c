package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact t-SNE (van der Maaten & Hinton 2008) on the driver over a
  * BOUNDED sample — the Spark-native stand-in for the reference's
  * `DimReducer(method='tsne')` (feature_transformers/dimreduction.py:
  * 96-147), which itself refits on every transform because t-SNE has no
  * out-of-sample transform. A 100 TB corpus cannot be t-SNE'd, full
  * stop — the algorithm is O(n²) in affinities and exists for
  * visualization; the honest scale contract is "embed a representative
  * bounded sample", so `transform` draws the md5-ordered prefix (the
  * same deterministic, row-order-invariant draw the IVF quantizer
  * uses), embeds it on the driver, and left-joins `dim_i` back by
  * `idCol` (rows outside the sample get null dims).
  *
  * Exact (not Barnes-Hut) because the sample is capped: at the default
  * 2000 rows the quadratic costs ~2s and has zero approximation knobs
  * to mis-tune; a BH tree would only matter past ~10k rows, beyond the
  * useful size of a scatter plot.
  */
object Tsne {

  /** Embed `x` (n×d) into `outDims` dimensions. Deterministic for a
    * given seed. Standard recipe: perplexity-calibrated Gaussian input
    * affinities (binary-searched per row), symmetrized; Student-t
    * low-dim kernel; gradient descent with momentum 0.5→0.8 at iter
    * 250 and ×12 early exaggeration for the first 100 iters. */
  def embed(x: Array[Array[Double]], outDims: Int = 2,
      perplexity: Double = 30.0, iters: Int = 500,
      seed: Long = 42L): Array[Array[Double]] = {
    val n = x.length
    require(n >= 4, s"t-SNE needs at least 4 rows, got $n")
    val perp = math.min(perplexity, (n - 1) / 3.0)
    val d2 = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      var s = 0.0; var k = 0
      val xi = x(i); val xj = x(j)
      while (k < xi.length) { val t = xi(k) - xj(k); s += t * t; k += 1 }
      d2(i)(j) = s; d2(j)(i) = s
    }
    // conditional affinities p_{j|i} at the target perplexity
    val p = Array.ofDim[Double](n, n)
    val logPerp = math.log(perp)
    for (i <- 0 until n) {
      var lo = 1e-20; var hi = 1e20; var beta = 1.0 // beta = 1/(2σ²)
      var it = 0
      while (it < 64) {
        var sum = 0.0; var sumD = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = math.exp(-d2(i)(j) * beta)
            sum += e; sumD += d2(i)(j) * e
          }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + beta * sumD / sum else 0.0
        if (h > logPerp) { lo = beta; beta = if (hi >= 1e20) beta * 2 else (beta + hi) / 2 }
        else { hi = beta; beta = (beta + lo) / 2 }
        it += 1
      }
      var z = 0.0
      for (j <- 0 until n if j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); z += p(i)(j) }
      if (z > 0) for (j <- 0 until n) p(i)(j) /= z
    }
    // symmetrize; floor keeps the KL gradient defined everywhere
    val pij = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n if i != j)
      pij(i)(j) = math.max((p(i)(j) + p(j)(i)) / (2.0 * n), 1e-12)

    val rng = new scala.util.Random(seed)
    val y = Array.fill(n, outDims)(rng.nextGaussian() * 1e-2)
    val dy = Array.ofDim[Double](n, outDims)
    val vel = Array.ofDim[Double](n, outDims)
    val lr = 200.0
    for (iter <- 0 until iters) {
      val exag = if (iter < 100) 12.0 else 1.0
      val momentum = if (iter < 250) 0.5 else 0.8
      // Student-t kernel and its normalizer
      val num = Array.ofDim[Double](n, n)
      var z = 0.0
      for (i <- 0 until n; j <- (i + 1) until n) {
        var s = 0.0; var k = 0
        while (k < outDims) { val t = y(i)(k) - y(j)(k); s += t * t; k += 1 }
        val u = 1.0 / (1.0 + s)
        num(i)(j) = u; num(j)(i) = u; z += 2.0 * u
      }
      for (i <- 0 until n) {
        java.util.Arrays.fill(dy(i), 0.0)
        for (j <- 0 until n if j != i) {
          val q = math.max(num(i)(j) / z, 1e-12)
          val g = (exag * pij(i)(j) - q) * num(i)(j)
          var k = 0
          while (k < outDims) {
            dy(i)(k) += 4.0 * g * (y(i)(k) - y(j)(k)); k += 1
          }
        }
      }
      for (i <- 0 until n; k <- 0 until outDims) {
        vel(i)(k) = momentum * vel(i)(k) - lr * dy(i)(k)
        y(i)(k) += vel(i)(k)
      }
      // recenter (the objective is translation-invariant)
      for (k <- 0 until outDims) {
        var mu = 0.0
        for (i <- 0 until n) mu += y(i)(k)
        mu /= n
        for (i <- 0 until n) y(i)(k) -= mu
      }
    }
    y
  }
}

/** `DimReducer(method='tsne')` surface: appends `dim_0..dim_{k-1}` for
  * the embedded sample rows (null outside the sample — t-SNE defines no
  * out-of-sample transform; the reference refits on every call for the
  * same reason, dimreduction.py:139-147). `transform` == fit_transform,
  * matching the reference's refit-on-transform contract. */
case class TsneReducer(featureCols: Seq[String], idCol: String,
    nComponents: Int = 2, perplexity: Double = 30.0, iters: Int = 500,
    seed: Long = 42L, maxRows: Int = 2000)
    extends graft.operators.GraftTransformer {
  def outputNames: Seq[String] = (0 until nComponents).map(i => s"dim_$i")
  def transform(df: DataFrame): DataFrame = {
    val sample = df
      .select(col(idCol) +: featureCols.map(c => col(c).cast("double")): _*)
      .na.drop()
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .orderBy(col("__ord")).limit(maxRows).drop("__ord")
      .collect()
    val ids = sample.map(_.get(0))
    val x = sample.map(r => featureCols.indices.map(i =>
      r.getDouble(i + 1)).toArray)
    val y = Tsne.embed(x, nComponents, perplexity, iters, seed)
    val spark = df.sparkSession
    val rows = ids.zip(y).map { case (id, dims) =>
      org.apache.spark.sql.Row.fromSeq(id +: dims.toSeq)
    }
    val idField = df.schema(idCol)
    val schema = org.apache.spark.sql.types.StructType(
      idField +: outputNames.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DoubleType)))
    val embedded = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    df.join(broadcast(embedded), Seq(idCol), "left")
  }
}
