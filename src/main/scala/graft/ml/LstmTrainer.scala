package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flat-parameter BPTT kernel for a one-layer LSTM (+ linear head): the
  * per-row gradient of 0.5·(pred − y)², written against a single flat
  * weight array so gradients aggregate as one vector sum.
  *
  * Layout (per gate g ∈ i,f,c̃,o in that order):
  * `W_g` F×H feature-major, `U_g` H×H prev-hidden-major, `b_g` H —
  * then `wOut` H, `bOut`. Total 4(FH + H² + H) + H + 1.
  *
  * The forward recurrence matches [[LstmScorer.stepStages]] exactly
  * (Keras gate order and the t=0 convention h₋₁ = c₋₁ = 0, where the
  * recurrent term is omitted and c₀ = i∘g — so the forget gate has zero
  * gradient at t=0): weights fitted here score identically through the
  * distributed codegen'd forward pass.
  */
object LstmBptt {

  def size(f: Int, h: Int): Int = 4 * (f * h + h * h + h) + h + 1

  /** Offsets of gate `g` (0=i,1=f,2=c̃,3=o): (W, U, b). */
  private def gateOff(g: Int, f: Int, h: Int): (Int, Int, Int) = {
    val blk = f * h + h * h + h
    val base = g * blk
    (base, base + f * h, base + f * h + h * h)
  }
  private def wOutOff(f: Int, h: Int): Int = 4 * (f * h + h * h + h)

  /** Unpack a flat vector into the scorer's weight case class. */
  def toWeights(w: Array[Double], f: Int, h: Int): LstmWeights = {
    def mat(off: Int, rows: Int): Array[Array[Double]] =
      Array.tabulate(rows, h)((r, u) => w(off + r * h + u))
    def vec(off: Int): Array[Double] = Array.tabulate(h)(u => w(off + u))
    val Seq((wi, ui, bi), (wf, uf, bf), (wc, uc, bc), (wo, uo, bo)) =
      (0 until 4).map(g => gateOff(g, f, h))
    LstmWeights(
      mat(wi, f), mat(ui, h), vec(bi),
      mat(wf, f), mat(uf, h), vec(bf),
      mat(wc, f), mat(uc, h), vec(bc),
      mat(wo, f), mat(uo, h), vec(bo),
      Array.tabulate(h)(u => w(wOutOff(f, h) + u)),
      w(size(f, h) - 1))
  }

  /** Training-time dropout sample (Keras LSTM semantics,
    * sequence.py:123-132): `in` masks the step inputs and `rec` the
    * recurrent state, with ONE Bernoulli mask PER GATE held constant
    * across all timesteps of the row (the Keras `dropout` /
    * `recurrent_dropout` behavior), inverted 1/(1−p) scaling. `seed`
    * fixes the sample so forward/backward and finite-difference pairs
    * see the same sub-network. `perCell`, when set, carries one
    * (dropout, recurrent_dropout) pair PER STACKED LAYER — the
    * reference's `lstm_units` tuple list (sequence.py:105,123) — and
    * overrides the scalar rates in [[LstmStackBptt]]'s mask sampling
    * (the one-layer kernel has a single cell and ignores it). */
  case class Drop(in: Double, rec: Double, seed: Long,
      perCell: Seq[(Double, Double)] = null) {
    require(in >= 0 && in < 1 && rec >= 0 && rec < 1,
      s"dropout rates in [0, 1), got ($in, $rec)")
    require(perCell == null || perCell.forall { case (i, r) =>
      i >= 0 && i < 1 && r >= 0 && r < 1 },
      s"per-layer dropout rates in [0, 1), got $perCell")
  }

  /** Forward pass only: prediction for one row (used by the gradient
    * check; production scoring goes through [[LstmScorer]]). */
  def forward(w: Array[Double], f: Int, h: Int,
      x: Array[Array[Double]], drop: Drop = null): Double =
    run(w, f, h, x, 0.0, null, drop)

  /** Forward + (if `acc` non-null) backward, accumulating the gradient
    * into `acc` (same layout as `w`, one extra slot for the loss is NOT
    * assumed — caller tracks loss from the return). Returns the
    * prediction (acc == null) or the squared-error loss (acc != null). */
  def run(w: Array[Double], f: Int, h: Int, x: Array[Array[Double]],
      y: Double, acc: Array[Double], drop: Drop = null): Double = {
    val T = x.length
    val (wiO, uiO, biO) = gateOff(0, f, h)
    val (wfO, ufO, bfO) = gateOff(1, f, h)
    val (wcO, ucO, bcO) = gateOff(2, f, h)
    val (woO, uoO, boO) = gateOff(3, f, h)
    val woutO = wOutOff(f, h)
    val ig = Array.ofDim[Double](T, h); val fg = Array.ofDim[Double](T, h)
    val gg = Array.ofDim[Double](T, h); val og = Array.ofDim[Double](T, h)
    val cs = Array.ofDim[Double](T, h); val hs = Array.ofDim[Double](T, h)
    val tc = Array.ofDim[Double](T, h)
    // per-gate masks (4×f input, 4×h recurrent), drawn in fixed order
    val (mIn, mRec) = if (drop == null) (null, null) else {
      val rng = new java.util.Random(drop.seed)
      (Array.fill(4)(SeqAdam.invBernoulli(rng, drop.in, f)),
        Array.fill(4)(SeqAdam.invBernoulli(rng, drop.rec, h)))
    }
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    var t = 0
    while (t < T) {
      val xt = x(t)
      var u = 0
      while (u < h) {
        var zi = w(biO + u); var zf = w(bfO + u)
        var zg = w(bcO + u); var zo = w(boO + u)
        var fi = 0
        while (fi < f) {
          val xv = xt(fi); val r = fi * h + u
          if (mIn == null) {
            zi += xv * w(wiO + r); zf += xv * w(wfO + r)
            zg += xv * w(wcO + r); zo += xv * w(woO + r)
          } else {
            zi += xv * mIn(0)(fi) * w(wiO + r)
            zf += xv * mIn(1)(fi) * w(wfO + r)
            zg += xv * mIn(2)(fi) * w(wcO + r)
            zo += xv * mIn(3)(fi) * w(woO + r)
          }
          fi += 1
        }
        if (t > 0) {
          val hp = hs(t - 1)
          var k = 0
          while (k < h) {
            val hv = hp(k); val r = k * h + u
            if (mRec == null) {
              zi += hv * w(uiO + r); zf += hv * w(ufO + r)
              zg += hv * w(ucO + r); zo += hv * w(uoO + r)
            } else {
              zi += hv * mRec(0)(k) * w(uiO + r)
              zf += hv * mRec(1)(k) * w(ufO + r)
              zg += hv * mRec(2)(k) * w(ucO + r)
              zo += hv * mRec(3)(k) * w(uoO + r)
            }
            k += 1
          }
        }
        ig(t)(u) = sigmoid(zi); fg(t)(u) = sigmoid(zf)
        gg(t)(u) = math.tanh(zg); og(t)(u) = sigmoid(zo)
        cs(t)(u) = (if (t > 0) fg(t)(u) * cs(t - 1)(u) else 0.0) +
          ig(t)(u) * gg(t)(u)
        tc(t)(u) = math.tanh(cs(t)(u))
        hs(t)(u) = og(t)(u) * tc(t)(u)
        u += 1
      }
      t += 1
    }
    var pred = w(size(f, h) - 1)
    var u = 0
    while (u < h) { pred += w(woutO + u) * hs(T - 1)(u); u += 1 }
    if (acc == null) return pred

    // backward
    val d = pred - y
    val dh = new Array[Double](h); val dc = new Array[Double](h)
    acc(size(f, h) - 1) += d
    u = 0
    while (u < h) {
      acc(woutO + u) += d * hs(T - 1)(u)
      dh(u) = w(woutO + u) * d
      u += 1
    }
    t = T - 1
    val dzi = new Array[Double](h); val dzf = new Array[Double](h)
    val dzg = new Array[Double](h); val dzo = new Array[Double](h)
    while (t >= 0) {
      val xt = x(t)
      var u2 = 0
      while (u2 < h) {
        val o = og(t)(u2); val i = ig(t)(u2); val g = gg(t)(u2)
        val tch = tc(t)(u2)
        dzo(u2) = dh(u2) * tch * o * (1 - o)
        val dcu = dc(u2) + dh(u2) * o * (1 - tch * tch)
        dzi(u2) = dcu * g * i * (1 - i)
        dzg(u2) = dcu * i * (1 - g * g)
        dzf(u2) = if (t > 0) {
          val fgu = fg(t)(u2)
          dcu * cs(t - 1)(u2) * fgu * (1 - fgu)
        } else 0.0
        // dc_{t-1}; the forget path only exists for t > 0
        dc(u2) = if (t > 0) dcu * fg(t)(u2) else 0.0
        acc(biO + u2) += dzi(u2); acc(bfO + u2) += dzf(u2)
        acc(bcO + u2) += dzg(u2); acc(boO + u2) += dzo(u2)
        var fi = 0
        while (fi < f) {
          val xv = xt(fi); val r = fi * h + u2
          if (mIn == null) {
            acc(wiO + r) += xv * dzi(u2); acc(wfO + r) += xv * dzf(u2)
            acc(wcO + r) += xv * dzg(u2); acc(woO + r) += xv * dzo(u2)
          } else {
            acc(wiO + r) += xv * mIn(0)(fi) * dzi(u2)
            acc(wfO + r) += xv * mIn(1)(fi) * dzf(u2)
            acc(wcO + r) += xv * mIn(2)(fi) * dzg(u2)
            acc(woO + r) += xv * mIn(3)(fi) * dzo(u2)
          }
          fi += 1
        }
        u2 += 1
      }
      if (t > 0) {
        val hp = hs(t - 1)
        var k = 0
        while (k < h) {
          var s = 0.0
          var u3 = 0
          while (u3 < h) {
            val r = k * h + u3
            if (mRec == null) {
              acc(uiO + r) += hp(k) * dzi(u3)
              acc(ufO + r) += hp(k) * dzf(u3)
              acc(ucO + r) += hp(k) * dzg(u3)
              acc(uoO + r) += hp(k) * dzo(u3)
              s += w(uiO + r) * dzi(u3) + w(ufO + r) * dzf(u3) +
                w(ucO + r) * dzg(u3) + w(uoO + r) * dzo(u3)
            } else {
              acc(uiO + r) += hp(k) * mRec(0)(k) * dzi(u3)
              acc(ufO + r) += hp(k) * mRec(1)(k) * dzf(u3)
              acc(ucO + r) += hp(k) * mRec(2)(k) * dzg(u3)
              acc(uoO + r) += hp(k) * mRec(3)(k) * dzo(u3)
              s += w(uiO + r) * mRec(0)(k) * dzi(u3) +
                w(ufO + r) * mRec(1)(k) * dzf(u3) +
                w(ucO + r) * mRec(2)(k) * dzg(u3) +
                w(uoO + r) * mRec(3)(k) * dzo(u3)
            }
            u3 += 1
          }
          dh(k) = s
          k += 1
        }
      }
      t -= 1
    }
    0.5 * d * d
  }
}

/** Trains the LSTM regressor the reference fits with Keras
  * (sequence.py:101-153) — one-layer by default, layer stacks via
  * `layers` (the reference's `lstm_units` list) and the single-layer
  * bidirectional layout via `bidirectional`, both through the
  * generalized [[LstmStackBptt]] kernel — with the same
  * treeAggregate-gradient + driver-Adam shape as
  * [[MLPRegressor]]: executors fold rows into ONE flat gradient
  * vector per epoch (map-side partial sums, depth-2 tree merge), the
  * driver holds only the weight vector. Fitted weights flow into the
  * existing distributed scoring path ([[LstmScorer]] — unrolled pure
  * column arithmetic, no UDF), so fit-once/score-anywhere works exactly
  * like the pinned-weights queries.
  *
  * `lagCols` must be lag-major over `seqLen` timesteps — the
  * LagTransformer output order ([[graft.operators.SequenceReshape]]).
  */
class LSTMTrainer(
    val lagCols: Seq[String],
    val seqLen: Int,
    val targetCol: String,
    val hidden: Int = 8,
    val lr: Double = 1e-2,
    val epochs: Int = 150,
    val seed: Long = 42L,
    val scaleTarget: Boolean = true,
    val batchFraction: Double = 0.2,
    val layers: Seq[Int] = Nil,
    val bidirectional: Boolean = false,
    val loss: String = "mse",
    val mseWeight: Double = 2.0,
    val spearmanWeight: Double = 1.0,
    val rankTau: Double = 1e-3,
    val rankBatch: Int = 64,
    val dropout: Double = 0.0,
    val recurrentDropout: Double = 0.0,
    val layerDropouts: Seq[(Double, Double)] = Nil,
    val layerNorm: Boolean = false,
    val optimizer: String = "adam") extends ModelEstimator {

  require(lagCols.size % seqLen == 0,
    s"${lagCols.size} lag columns do not reshape into $seqLen steps")
  require(batchFraction > 0 && batchFraction <= 1.0,
    s"batchFraction must be in (0, 1], got $batchFraction")
  require(!bidirectional || layers.size <= 1,
    "bidirectional fit covers the single-layer layout the scorer scores")
  require(Set("mse", "spearman", "combined")(loss),
    s"loss must be mse|spearman|combined, got $loss")
  require(dropout >= 0 && dropout < 1 &&
    recurrentDropout >= 0 && recurrentDropout < 1,
    s"dropout rates in [0, 1), got ($dropout, $recurrentDropout)")
  require(layerDropouts.isEmpty ||
    layerDropouts.size == math.max(layers.size, 1),
    s"layerDropouts (${layerDropouts.size}) must align with the layer " +
      s"list (${math.max(layers.size, 1)}) — the lstm_units tuple shape")
  // Training-time dropout (sequence.py:123-132, reference default
  // lstm_units=[(64, 0.01, 0.01)]): per-gate Keras-style masks,
  // constant across timesteps, per-row per-epoch seed — applied on
  // every fit layout (single, stacked, bidirectional; each cell draws
  // its own masks, the Keras per-layer behavior). `layerDropouts`
  // carries the reference's PER-LAYER (dropout, recurrent_dropout)
  // tuples (sequence.py:105,123); the scalar pair remains the
  // shared-rate shorthand. Bidirectional wraps one configured cell, so
  // both directions share the single pair — exactly Keras.
  private val effDropouts: Seq[(Double, Double)] =
    if (layerDropouts.nonEmpty) layerDropouts
    else Seq.fill(math.max(layers.size, 1))((dropout, recurrentDropout))
  private def anyDropout: Boolean =
    effDropouts.exists(p => p._1 > 0 || p._2 > 0)
  private val nFeat = lagCols.size / seqLen

  /** `layers.size > 1` (reference `lstm_units` list, sequence.py:120),
    * `bidirectional`, or `layerNorm` (the trainable use_layer_norm
    * stage lives only in the generalized kernel) selects
    * [[LstmStackBptt]]; otherwise the one-layer [[LstmBptt]] fast
    * path — with `layers == Seq(n)` honored as a one-layer fit of n
    * units. `use_batch_norm` training (batch statistics + moving
    * averages) is NOT fitted — the standardization-in-lieu-of-BatchNorm
    * deviation documented on the autoencoder; BN scoring parity over
    * pinned moving stats is [[LstmNorm]]'s affine mode. */
  private def stackCfg: Option[LstmStackBptt.Cfg] =
    if (bidirectional)
      Some(LstmStackBptt.Cfg(nFeat,
        if (layers.isEmpty) Seq(hidden) else layers, bidi = true,
        layerNorm = layerNorm))
    else if (layers.size > 1 || layerNorm)
      Some(LstmStackBptt.Cfg(nFeat,
        if (layers.isEmpty) Seq(hidden) else layers, bidi = false,
        layerNorm = layerNorm))
    else None

  private var weights: LstmWeights = _
  private var stacked: Seq[LstmWeights] = Nil
  private var stackedNorms: Seq[LstmNorm] = Nil
  private var bidi: (LstmWeights, LstmWeights, Array[Double], Double) = _
  private var bidiLn: LstmNorm = _
  private var flatKernel: Array[Double] = _
  private var yMean = 0.0
  private var yStd = 1.0

  def fittedWeights: LstmWeights = weights
  def fittedLayers: Seq[LstmWeights] = stacked
  def fittedNorms: Seq[LstmNorm] = stackedNorms
  def fittedBidi: (LstmWeights, LstmWeights, Array[Double], Double) = bidi

  def steps: Seq[Seq[String]] = lagCols.grouped(nFeat).toSeq

  def fit(df: DataFrame): this.type = {
    val f = nFeat
    val h = effH // one-element `layers` honored (lstm_units=[n])
    val data = df.select((targetCol +: lagCols).map(c =>
      col(c).cast("double")): _*).na.drop()
    data.cache()
    val n = data.count().toDouble
    require(n > 0, "no complete rows to fit on")
    if (scaleTarget) {
      val r = data.agg(avg(col(targetCol)), stddev_pop(col(targetCol)))
        .collect()(0)
      yMean = r.getDouble(0); yStd = math.max(r.getDouble(1), 1e-12)
    }
    stackCfg match {
      case Some(cfg) =>
        val w = LstmStackBptt.init(cfg, seed)
        adamEpochs(data, cfg.size, w,
          (bw, x, y, acc, ms) => LstmStackBptt.run(bw, cfg, x, y, acc,
            if (anyDropout)
              LstmBptt.Drop(effDropouts.head._1, effDropouts.head._2, ms,
                if (effDropouts.size > 1) effDropouts else null)
            else null))
        materialize(w)
      case None =>
        val sz = LstmBptt.size(f, h)
        val rng = new scala.util.Random(seed)
        val w = new Array[Double](sz)
        // Glorot for the input blocks, scaled-uniform for the recurrent
        // blocks; Keras-style unit forget bias (inert at t=0 by the
        // cell's h₋₁ = 0 convention but it stabilizes early epochs)
        val limW = math.sqrt(6.0 / (f + h))
        val limU = math.sqrt(6.0 / (2.0 * h))
        val blk = f * h + h * h + h
        for (g <- 0 until 4) {
          val base = g * blk
          for (i <- 0 until f * h)
            w(base + i) = (rng.nextDouble() * 2 - 1) * limW
          for (i <- 0 until h * h)
            w(base + f * h + i) = (rng.nextDouble() * 2 - 1) * limU
          if (g == 1)
            for (i <- 0 until h) w(base + f * h + h * h + i) = 1.0
        }
        val limOut = math.sqrt(6.0 / (h + 1))
        for (i <- 0 until h + 1)
          w(4 * blk + i) = (rng.nextDouble() * 2 - 1) * limOut
        adamEpochs(data, sz, w,
          (bw, x, y, acc, ms) => LstmBptt.run(bw, f, h, x, y, acc,
            if (anyDropout)
              LstmBptt.Drop(effDropouts.head._1, effDropouts.head._2, ms)
            else null))
        materialize(w)
    }
    data.unpersist()
    this
  }

  /** Effective one-layer unit count (a one-element `layers` list IS the
    * one-layer fast path — lstm_units=[n], sequence.py:120). */
  private def effH: Int =
    if (!bidirectional && layers.size == 1) layers.head else hidden

  /** Decode a final flat kernel into the scorer-side weight containers —
    * shared by the fit tail and [[LSTMTrainer.load]], so a loaded
    * estimator scores through EXACTLY the conversion the fitted one
    * used. */
  private def materialize(w: Array[Double]): Unit = {
    flatKernel = w
    stackCfg match {
      case Some(cfg) =>
        if (cfg.bidi) {
          bidi = LstmStackBptt.toBidi(w, cfg)
          if (layerNorm) bidiLn = LstmStackBptt.bidiNorm(w, cfg)
        } else {
          stacked = LstmStackBptt.toStacked(w, cfg)
          if (layerNorm) stackedNorms = LstmStackBptt.stackNorms(w, cfg)
        }
      case None =>
        weights = LstmBptt.toWeights(w, nFeat, effH)
    }
  }

  /** Kernel length the configured architecture expects — the loader's
    * shape validation. */
  private def kernelSize: Int = stackCfg match {
    case Some(cfg) => cfg.size
    case None => LstmBptt.size(nFeat, effH)
  }

  /** Persist the FITTED estimator (flat kernel + target scaling +
    * schema + fit recipe) — the sklearn-pickle role the reference gets
    * free from its wrapper (keras_estimators/base.py holds the fitted
    * Keras model inside the sklearn estimator). JSON exact doubles, so
    * [[LSTMTrainer.load]] scores bit-identically (WeightsIOSpec
    * pattern). */
  def familyName: String = "lstm"
  def predictionNames: Seq[String] = Seq("prediction")

  def saveParts: (Map[String, String], Seq[(String, Array[Double])]) = {
    require(flatKernel != null, "fit first")
    (Map(
      "family" -> "lstm",
      "lagCols" -> WeightsIO.namesToMeta(lagCols),
      "seqLen" -> seqLen.toString, "target" -> targetCol,
      "hidden" -> hidden.toString,
      "layers" -> layers.mkString(","),
      "bidirectional" -> bidirectional.toString,
      "layerNorm" -> layerNorm.toString,
      "scaleTarget" -> scaleTarget.toString,
      "yMean" -> yMean.toString, "yStd" -> yStd.toString,
      "lr" -> lr.toString, "epochs" -> epochs.toString,
      "seed" -> seed.toString,
      "batchFraction" -> batchFraction.toString, "loss" -> loss,
      "dropout" -> dropout.toString,
      "recurrentDropout" -> recurrentDropout.toString,
      "layerDropouts" -> WeightsIO.pairsToMeta(layerDropouts),
      "mseWeight" -> mseWeight.toString,
      "spearmanWeight" -> spearmanWeight.toString,
      "rankTau" -> rankTau.toString, "rankBatch" -> rankBatch.toString,
      "optimizer" -> optimizer),
      Seq("flat" -> flatKernel))
  }

  def save(path: String): Unit = {
    val (m, s) = saveParts
    WeightsIO.save(path, m, s)
  }

  /** Shared epoch loop — delegates to [[SeqAdam]] (also used by the
    * transformer trainer). */
  private def adamEpochs(data: DataFrame, sz: Int, w: Array[Double],
      kernel: (Array[Double], Array[Array[Double]], Double, Array[Double],
        Long) => Double): Unit =
    SeqAdam.run(data, sz, w, SeqAdam.Cfg(nFeat, seqLen, yMean, yStd,
      epochs, lr, seed, batchFraction, loss, mseWeight, spearmanWeight,
      rankTau, rankBatch, optimizer), kernel)

  /** Appends `prediction` through the distributed unrolled forward pass
    * (one-layer, stacked, or bidirectional to match the fitted layout),
    * un-standardizing if the target was scaled at fit. */
  def predict(df: DataFrame): DataFrame = {
    val scored =
      if (bidi != null)
        LstmScorer.scoreBidirectional(df, steps, bidi._1, bidi._2,
          bidi._3, bidi._4, bidiLn)
      else if (stacked.nonEmpty)
        LstmScorer.scoreStacked(df, steps, stacked, stackedNorms)
      else {
        require(weights != null, "fit first")
        LstmScorer.score(df, steps, weights)
      }
    if (scaleTarget)
      scored.withColumn("prediction",
        col("prediction") * lit(yStd) + lit(yMean))
    else scored
  }
}

object LSTMTrainer {
  /** Rehydrate a `save`d estimator: architecture, target scaling, and
    * the flat kernel restored bit-exactly, then decoded through the
    * SAME materialization as fit — `predict` on the loaded instance
    * equals `predict` on the fitted one byte for byte. */
  def load(path: String): LSTMTrainer = {
    val (meta, sections) = WeightsIO.load(path)
    fromParts(meta, sections, path)
  }

  /** Rebuild from an already-parsed payload (standalone or
    * pipeline-embedded). */
  def fromParts(meta: Map[String, String],
      sections: Map[String, Array[Double]], where: String): LSTMTrainer = {
    WeightsIO.requireFamily(meta, "lstm", where)
    val layers = WeightsIO.intsFromMeta(meta("layers"))
    val m = new LSTMTrainer(
      WeightsIO.namesFromMeta(meta("lagCols")),
      meta("seqLen").toInt, meta("target"),
      hidden = meta("hidden").toInt, lr = meta("lr").toDouble,
      epochs = meta("epochs").toInt, seed = meta("seed").toLong,
      scaleTarget = meta("scaleTarget").toBoolean,
      batchFraction = meta("batchFraction").toDouble,
      layers = layers,
      bidirectional = meta("bidirectional").toBoolean,
      loss = meta("loss"),
      mseWeight = meta("mseWeight").toDouble,
      spearmanWeight = meta("spearmanWeight").toDouble,
      rankTau = meta("rankTau").toDouble,
      rankBatch = meta("rankBatch").toInt,
      dropout = meta("dropout").toDouble,
      recurrentDropout = meta("recurrentDropout").toDouble,
      layerDropouts = WeightsIO.pairsFromMeta(meta("layerDropouts")),
      layerNorm = meta("layerNorm").toBoolean,
      optimizer = meta("optimizer"))
    val flat = sections("flat")
    WeightsIO.requireLen("flat", flat, m.kernelSize)
    m.yMean = meta("yMean").toDouble
    m.yStd = meta("yStd").toDouble
    m.materialize(flat)
    m
  }
}

/** Joint multi-output LSTM fit — the base class's `output_units > 1`
  * (base.py:46, sequence.py:146) with the `prediction_{i}` naming
  * contract (base.py:144-150): ALL heads train together through the
  * SHARED recurrent trunk (one Dense(output_units) over the final
  * state), per-output target standardization, the
  * [[MLPMultiRegressor]] shape on the [[LstmStackBptt]] kernel.
  * Stacked layers, per-layer dropout tuples, and `layerNorm` compose;
  * non-bidirectional (the multi scorer reads the stacked layout).
  * `loss = "spearman" | "combined"` trains the reference's rank
  * objectives with their exact multi-output semantics — the loss
  * flattens (batch, out) to ONE ranked vector (losses.py:67-69). */
class LSTMMultiTrainer(
    val lagCols: Seq[String],
    val seqLen: Int,
    val targetCols: Seq[String],
    val hidden: Int = 8,
    val lr: Double = 1e-2,
    val epochs: Int = 150,
    val seed: Long = 42L,
    val scaleTarget: Boolean = true,
    val batchFraction: Double = 0.2,
    val layers: Seq[Int] = Nil,
    val dropout: Double = 0.0,
    val recurrentDropout: Double = 0.0,
    val layerDropouts: Seq[(Double, Double)] = Nil,
    val layerNorm: Boolean = false,
    val loss: String = "mse",
    val mseWeight: Double = 2.0,
    val spearmanWeight: Double = 1.0,
    val rankTau: Double = 1e-3,
    val rankBatch: Int = 64,
    val optimizer: String = "adam") extends ModelEstimator {

  require(targetCols.size >= 2, "use LSTMTrainer for a single output")
  require(Set("mse", "spearman", "combined")(loss),
    s"loss must be mse|spearman|combined, got $loss")
  require(lagCols.size % seqLen == 0,
    s"${lagCols.size} lag columns do not reshape into $seqLen steps")
  require(batchFraction > 0 && batchFraction <= 1.0,
    s"batchFraction must be in (0, 1], got $batchFraction")
  require(layerDropouts.isEmpty ||
    layerDropouts.size == math.max(layers.size, 1),
    "layerDropouts must align with the layer list")

  private val nFeat = lagCols.size / seqLen
  private val out = targetCols.size
  private val effDropouts: Seq[(Double, Double)] =
    if (layerDropouts.nonEmpty) layerDropouts
    else Seq.fill(math.max(layers.size, 1))((dropout, recurrentDropout))
  private def anyDropout: Boolean =
    effDropouts.exists(p => p._1 > 0 || p._2 > 0)

  private var cells: Seq[LstmWeights] = Nil
  private var headW: Array[Array[Double]] = _
  private var headB: Array[Double] = _
  private var norms: Seq[LstmNorm] = Nil
  private var flatKernel: Array[Double] = _
  private var yMean: Array[Double] = Array.fill(out)(0.0)
  private var yStd: Array[Double] = Array.fill(out)(1.0)

  def fittedCells: Seq[LstmWeights] = cells
  def fittedHead: (Array[Array[Double]], Array[Double]) = (headW, headB)

  def steps: Seq[Seq[String]] = lagCols.grouped(nFeat).toSeq

  private def kernelCfg: LstmStackBptt.Cfg = LstmStackBptt.Cfg(nFeat,
    if (layers.isEmpty) Seq(hidden) else layers, bidi = false,
    layerNorm = layerNorm, out = out)

  /** Decode a final flat kernel — shared by the fit tail and
    * [[LSTMMultiTrainer.load]]. */
  private def materialize(w: Array[Double]): Unit = {
    flatKernel = w
    val cfg = kernelCfg
    cells = LstmStackBptt.stackCells(w, cfg)
    val (hw, hb) = LstmStackBptt.headMulti(w, cfg)
    headW = hw; headB = hb
    if (layerNorm) norms = LstmStackBptt.stackNorms(w, cfg)
  }

  def familyName: String = "lstm_multi"
  def predictionNames: Seq[String] =
    targetCols.indices.map(o => s"prediction_$o")

  /** The fitted payload (flat kernel + per-output scaling + recipe) —
    * [[LSTMMultiTrainer.load]] scores bit-identically. */
  def saveParts: (Map[String, String], Seq[(String, Array[Double])]) = {
    require(flatKernel != null, "fit first")
    (Map(
      "family" -> "lstm_multi",
      "lagCols" -> WeightsIO.namesToMeta(lagCols),
      "seqLen" -> seqLen.toString,
      "targets" -> WeightsIO.namesToMeta(targetCols),
      "hidden" -> hidden.toString, "layers" -> layers.mkString(","),
      "layerNorm" -> layerNorm.toString,
      "scaleTarget" -> scaleTarget.toString,
      "lr" -> lr.toString, "epochs" -> epochs.toString,
      "seed" -> seed.toString,
      "batchFraction" -> batchFraction.toString, "loss" -> loss,
      "dropout" -> dropout.toString,
      "recurrentDropout" -> recurrentDropout.toString,
      "layerDropouts" -> WeightsIO.pairsToMeta(layerDropouts),
      "mseWeight" -> mseWeight.toString,
      "spearmanWeight" -> spearmanWeight.toString,
      "rankTau" -> rankTau.toString, "rankBatch" -> rankBatch.toString,
      "optimizer" -> optimizer),
      Seq("flat" -> flatKernel, "yMeans" -> yMean, "yStds" -> yStd))
  }

  def save(path: String): Unit = {
    val (m, s) = saveParts
    WeightsIO.save(path, m, s)
  }

  def fit(df: DataFrame): this.type = {
    val cfg = kernelCfg
    val data = df.select((targetCols ++ lagCols).map(c =>
      col(c).cast("double")): _*).na.drop()
    data.cache()
    require(data.count() > 0, "no complete rows to fit on")
    if (scaleTarget) {
      val exprs = targetCols.map(c => avg(col(c))) ++
        targetCols.map(c => stddev_pop(col(c)))
      val r = data.agg(exprs.head, exprs.tail: _*).collect()(0)
      yMean = Array.tabulate(out)(o => r.getDouble(o))
      yStd = Array.tabulate(out)(o =>
        math.max(r.getDouble(out + o), 1e-12))
    }
    val w = LstmStackBptt.init(cfg, seed)
    SeqAdam.runMulti(data, cfg.size, w, out, yMean, yStd, nFeat, seqLen,
      epochs, lr, seed, batchFraction,
      (bw, x, ys, acc, ms, po) => LstmStackBptt.runMulti(bw, cfg, x, ys,
        acc,
        if (anyDropout)
          LstmBptt.Drop(effDropouts.head._1, effDropouts.head._2, ms,
            if (effDropouts.size > 1) effDropouts else null)
        else null, po),
      loss, mseWeight, spearmanWeight, rankTau, rankBatch, optimizer)
    materialize(w)
    data.unpersist()
    this
  }

  /** Appends `prediction_{i}` per target through the distributed
    * stacked forward pass, un-standardizing each output. */
  def predict(df: DataFrame): DataFrame = {
    require(cells.nonEmpty, "fit first")
    var scored = LstmScorer.scoreStackedMulti(df, steps, cells, headW,
      headB, norms)
    if (scaleTarget)
      for (o <- 0 until out)
        scored = scored.withColumn(s"prediction_$o",
          col(s"prediction_$o") * lit(yStd(o)) + lit(yMean(o)))
    scored
  }
}

object LSTMMultiTrainer {
  /** Rehydrate a `save`d estimator (shape-validated). */
  def load(path: String): LSTMMultiTrainer = {
    val (meta, sections) = WeightsIO.load(path)
    fromParts(meta, sections, path)
  }

  /** Rebuild from an already-parsed payload (standalone or
    * pipeline-embedded). */
  def fromParts(meta: Map[String, String],
      sections: Map[String, Array[Double]], where: String)
      : LSTMMultiTrainer = {
    WeightsIO.requireFamily(meta, "lstm_multi", where)
    val targets = WeightsIO.namesFromMeta(meta("targets"))
    val layers = WeightsIO.intsFromMeta(meta("layers"))
    val m = new LSTMMultiTrainer(
      WeightsIO.namesFromMeta(meta("lagCols")),
      meta("seqLen").toInt, targets,
      hidden = meta("hidden").toInt, lr = meta("lr").toDouble,
      epochs = meta("epochs").toInt, seed = meta("seed").toLong,
      scaleTarget = meta("scaleTarget").toBoolean,
      batchFraction = meta("batchFraction").toDouble,
      layers = layers, dropout = meta("dropout").toDouble,
      recurrentDropout = meta("recurrentDropout").toDouble,
      layerDropouts = WeightsIO.pairsFromMeta(meta("layerDropouts")),
      layerNorm = meta("layerNorm").toBoolean,
      loss = meta("loss"),
      mseWeight = meta("mseWeight").toDouble,
      spearmanWeight = meta("spearmanWeight").toDouble,
      rankTau = meta("rankTau").toDouble,
      rankBatch = meta("rankBatch").toInt,
      optimizer = meta("optimizer"))
    val flat = sections("flat")
    WeightsIO.requireLen("flat", flat, m.kernelCfg.size)
    WeightsIO.requireLen("yMeans", sections("yMeans"), targets.size)
    WeightsIO.requireLen("yStds", sections("yStds"), targets.size)
    m.yMean = sections("yMeans")
    m.yStd = sections("yStds")
    m.materialize(flat)
    m
  }
}
