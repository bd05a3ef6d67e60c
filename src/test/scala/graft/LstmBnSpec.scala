package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml._

/** LSTM `use_batch_norm` TRAINING (sequence.py:108,143-144) at the
  * reference's default depth: batch-coupled gradient vs central finite
  * differences (single and bidirectional, plain and dropout-masked),
  * AR(2) fit quality, and population-fold scoring parity with the
  * pinned-BN inference path. */
class LstmBnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ar2(n: Int, seedV: Int) = {
    val r = new scala.util.Random(seedV)
    val series = new Array[Double](n + 20)
    for (i <- 2 until series.length)
      series(i) = 1.4 * series(i - 1) - 0.45 * series(i - 2) +
        0.3 * r.nextGaussian()
    (4 until n).map { i =>
      (i.toLong, series(i - 4), series(i - 3), series(i - 2),
        series(i - 1), series(i))
    }
  }
  private val lags = Seq("lag4", "lag3", "lag2", "lag1")

  test("lstm bn: batched gradient (BN statistics coupled across the " +
    "batch's final states) matches central finite differences — " +
    "single-layer AND bidirectional") {
    for (bidi <- Seq(false, true)) {
      val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
        hidden = 3, bidirectional = bidi, batchSize = 7)
      val r = new scala.util.Random(if (bidi) 31 else 13)
      val rows = (0 until 7).map(_ =>
        (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian(),
          r.nextGaussian(), r.nextGaussian()))
      val data = rows.toDF("y", "lag4", "lag3", "lag2", "lag1")
        .repartition(1)
      val sz = m.size
      val p = Array.tabulate(sz)(i =>
        if (i < sz - 2 * (if (bidi) 6 else 3)) r.nextGaussian() * 0.3
        else 1.0 + r.nextGaussian() * 0.1)
      val (g, _) = m.gradient(data, p)
      val eps = 1e-6
      for (i <- 0 until sz) {
        val pp = p.clone(); pp(i) += eps
        val pm = p.clone(); pm(i) -= eps
        val fd = (m.gradient(data, pp)._2 - m.gradient(data, pm)._2) /
          (2 * eps)
        assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
          s"bn lstm grad mismatch (bidi=$bidi) at $i: " +
            s"analytic=${g(i)} fd=$fd")
      }
    }
  }

  test("lstm bn: gradient matches finite differences with Keras " +
    "dropout/recurrent_dropout masks held fixed by the seed stream") {
    val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
      hidden = 3, batchSize = 6, dropout = 0.25, recurrentDropout = 0.25)
    val r = new scala.util.Random(23)
    val rows = (0 until 6).map(_ =>
      (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian(),
        r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y", "lag4", "lag3", "lag2", "lag1")
      .repartition(1)
    val sz = m.size
    val p = Array.tabulate(sz)(i =>
      if (i < sz - 6) r.nextGaussian() * 0.3
      else 1.0 + r.nextGaussian() * 0.1)
    // ep != 0 activates the per-row mask draws; same ep on every call
    // keeps the sub-network fixed for the FD probe
    val (g, _) = m.gradient(data, p, ep = 5L)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val fd = (m.gradient(data, pp, ep = 5L)._2 -
        m.gradient(data, pm, ep = 5L)._2) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"masked bn lstm grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("lstm bn: use_batch_norm fit learns AR(2) to R^2 > 0.8 and " +
    "scores through the population-affine staged forward (parity with " +
    "the driver session + affine)") {
    val df = ar2(600, 4).toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
    val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
      hidden = 6, lr = 0.02, epochs = 150)
    val pred = m.fit(df).predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"BN LSTM failed to learn AR(2): r2=$r2")
    // staged scoring == driver forward through the population affine
    val nm = m.fittedNorm
    assert(nm.movingMean != null && nm.movingVar != null)
    val sample = pred.select((lags.map(col) :+ col("prediction")): _*)
      .limit(10).collect()
    sample.foreach { row =>
      val x = Array.tabulate(4, 1)((t, _) => row.getDouble(t))
      // rebuild the state with the fitted weights via the scorer-side
      // norm fold: y = gamma*(s-mu)/sqrt(var+eps)+beta, then the head
      val pv = predVia(m, x)
      assert(math.abs(pv - row.getDouble(4)) < 1e-9,
        s"bn-folded scorer and driver forward disagree: " +
          s"$pv vs ${row.getDouble(4)}")
    }
  }

  /** Driver-side inference forward: StateSession state → population
    * affine → Dense head → destandardize. */
  private def predVia(m: LSTMBnTrainer, x: Array[Array[Double]]): Double = {
    val cfg = m.config
    val w = m.fittedWeights
    val nm = m.fittedNorm
    val (yMean, yStd) = m.targetStats
    val st = new LstmStackBptt.StateSession(w, cfg, x).state
    var p = w(cfg.headBias)
    for (u <- st.indices) {
      val aff = nm.gamma(u) / math.sqrt(nm.movingVar(u) + nm.eps)
      val sn = aff * (st(u) - nm.movingMean(u)) + nm.beta(u)
      p += w(cfg.headOff + u) * sn
    }
    p * yStd + yMean
  }

  test("lstm bn, strict-Keras moving-average mode: training identical " +
    "to population mode, the folded statistics differ, and the MA " +
    "scorer still learns AR(2) through the same staged forward") {
    // one partition: cross-fit comparison needs a deterministic reduce
    val df = ar2(500, 6).toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
      .coalesce(1)
    // momentum 0.9: the fixture's effective Keras batch-step count is
    // small, so the default 0.99 would keep a visible share of the
    // (0,1) EMA init (same early-training bias real Keras shows)
    def fitWith(mode: String) = new LSTMBnTrainer(lags, seqLen = 4,
      targetCol = "y", hidden = 6, lr = 0.02, epochs = 120,
      bnInference = mode, bnMomentum = 0.9).fit(df)
    val pop = fitWith("population")
    val ma = fitWith("moving_average")
    assert(pop.fittedWeights.sameElements(ma.fittedWeights),
      "the flag must not touch training")
    val (nP, nM) = (pop.fittedNorm, ma.fittedNorm)
    assert(!nP.movingMean.sameElements(nM.movingMean) ||
      !nP.movingVar.sameElements(nM.movingVar),
      "moving-average mode must produce different inference statistics")
    val pred = ma.predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"MA-mode BN LSTM failed to learn AR(2): r2=$r2")
    // staged scoring still equals the driver forward through the
    // (now EMA-backed) affine fold
    val sample = pred.select((lags.map(col) :+ col("prediction")): _*)
      .limit(10).collect()
    sample.foreach { row =>
      val x = Array.tabulate(4, 1)((t, _) => row.getDouble(t))
      val pv = predVia(ma, x)
      assert(math.abs(pv - row.getDouble(4)) < 1e-9)
    }
  }

  test("lstm bn stacked (2-layer): gradient matches finite differences " +
    "— inner BN couples batch AND time, the state BN couples the batch") {
    val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
      layers = Seq(3, 2), batchSize = 6)
    val r = new scala.util.Random(41)
    val rows = (0 until 6).map(_ =>
      (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian(),
        r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y", "lag4", "lag3", "lag2", "lag1")
      .repartition(1)
    val sz = m.size
    val bnTail = 2 * (3 + 2)
    val p = Array.tabulate(sz)(i =>
      if (i < sz - bnTail) r.nextGaussian() * 0.3
      else 1.0 + r.nextGaussian() * 0.1)
    val (g, _) = m.gradient(data, p)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val fd = (m.gradient(data, pp)._2 - m.gradient(data, pm)._2) /
        (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"stacked bn lstm grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("lstm bn stacked: use_batch_norm fit (layers=[6,4]) learns AR(2) " +
    "to R^2 > 0.8 and scores through the per-site population affines " +
    "(inner site over rows x timesteps)") {
    val df = ar2(600, 7).toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
    val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
      layers = Seq(6, 4), lr = 0.02, epochs = 150)
    val pred = m.fit(df).predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"stacked BN LSTM failed to learn AR(2): r2=$r2")
    assert(m.fittedNorms.size == 2 &&
      m.fittedNorms.forall(_.movingMean != null))
    // staged scoring == driver forward folding each site's affine
    val sample = pred.select((lags.map(col) :+ col("prediction")): _*)
      .limit(10).collect()
    sample.foreach { row =>
      val x = Array.tabulate(4, 1)((t, _) => row.getDouble(t))
      val pv = predViaStacked(m, x)
      assert(math.abs(pv - row.getDouble(4)) < 1e-9,
        s"stacked bn scorer and driver forward disagree: " +
          s"$pv vs ${row.getDouble(4)}")
    }
  }

  /** Driver-side stacked inference forward: per-layer sweeps with each
    * site's population affine folded between layers, then the head. */
  private def predViaStacked(m: LSTMBnTrainer,
      x: Array[Array[Double]]): Double = {
    val cfg = m.config
    val w = m.fittedWeights
    val (yMean, yStd) = m.targetStats
    val sess = new LstmStackBptt.LayerSession(w, cfg)
    var cur = x
    var state: Array[Double] = null
    for (l <- cfg.layers.indices) {
      val hs = sess.forwardLayer(l, cur)
      val nm = m.fittedNorms(l)
      def fold(v: Array[Double]): Array[Double] =
        Array.tabulate(v.length) { u =>
          nm.gamma(u) * (v(u) - nm.movingMean(u)) /
            math.sqrt(nm.movingVar(u) + nm.eps) + nm.beta(u)
        }
      if (l < cfg.layers.size - 1) cur = hs.map(fold)
      else state = fold(hs(hs.length - 1))
    }
    var p = w(cfg.headBias)
    for (u <- state.indices) p += w(cfg.headOff + u) * state(u)
    p * yStd + yMean
  }

  test("lstm bn both-flags (use_layer_norm + use_batch_norm, the Keras " +
    "LN-then-BN order): gradient matches finite differences — single " +
    "AND stacked layouts") {
    for (stacked <- Seq(false, true)) {
      val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
        hidden = 3, layers = if (stacked) Seq(3, 2) else Nil,
        layerNorm = true, batchSize = 6)
      val r = new scala.util.Random(if (stacked) 53 else 47)
      val rows = (0 until 6).map(_ =>
        (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian(),
          r.nextGaussian(), r.nextGaussian()))
      val data = rows.toDF("y", "lag4", "lag3", "lag2", "lag1")
        .repartition(1)
      val sz = m.size
      val bnTail = 4 * (if (stacked) 3 + 2 else 3) // BN + LN blocks
      val p = Array.tabulate(sz)(i =>
        if (i < sz - bnTail) r.nextGaussian() * 0.3
        else 1.0 + r.nextGaussian() * 0.1)
      val (g, _) = m.gradient(data, p)
      val eps = 1e-6
      for (i <- 0 until sz) {
        val pp = p.clone(); pp(i) += eps
        val pm = p.clone(); pm(i) -= eps
        val fd = (m.gradient(data, pp)._2 - m.gradient(data, pm)._2) /
          (2 * eps)
        assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
          s"both-flags grad mismatch (stacked=$stacked) at $i: " +
            s"analytic=${g(i)} fd=$fd")
      }
    }
  }

  test("lstm bn both-flags fit learns AR(2) to R^2 > 0.8; the BN " +
    "population affine folds into the LN gamma/beta so the staged " +
    "scorer sees ONE LayerNorm per site (parity with the driver fold)") {
    val df = ar2(600, 9).toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
    val m = new LSTMBnTrainer(lags, seqLen = 4, targetCol = "y",
      hidden = 6, layerNorm = true, lr = 0.02, epochs = 150)
    val pred = m.fit(df).predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"both-flags LSTM failed to learn AR(2): r2=$r2")
    val nm = m.fittedNorm
    assert(nm.movingMean == null,
      "both-flags mode must emit a FOLDED LayerNorm (no moving stats)")
    val sample = pred.select((lags.map(col) :+ col("prediction")): _*)
      .limit(10).collect()
    sample.foreach { row =>
      val x = Array.tabulate(4, 1)((t, _) => row.getDouble(t))
      val cfg = m.config
      val w = m.fittedWeights
      val (yMean, yStd) = m.targetStats
      val st = new LstmStackBptt.StateSession(w, cfg, x).state
      val h = st.length
      var mu = 0.0
      st.foreach(mu += _); mu /= h
      var v = 0.0
      st.foreach(z => v += (z - mu) * (z - mu)); v /= h
      val s0 = 1.0 / math.sqrt(v + nm.eps)
      var pv = w(cfg.headBias)
      for (u <- st.indices)
        pv += w(cfg.headOff + u) *
          (nm.gamma(u) * (st(u) - mu) * s0 + nm.beta(u))
      val local = pv * yStd + yMean
      assert(math.abs(local - row.getDouble(4)) < 1e-9,
        s"both-flags folded scorer disagrees: $local vs ${row.getDouble(4)}")
    }
  }
}
