package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSTM `use_batch_norm` TRAINING (sequence.py:108,143-144) for the
  * single-layer and bidirectional layouts — the reference's DEFAULT
  * depth (`lstm_units` carries one layer), where the flag's only BN
  * site is the final (bidi: concatenated) hidden state feeding the
  * Dense head. Training is faithful Keras batch semantics: each
  * bounded in-partition batch normalizes the states with ITS OWN
  * statistics, the backward couples the batch's rows through them
  * ([[BatchNorm.backward]]), and gamma/beta train jointly with the
  * cells via per-row BPTT from the injected state gradient
  * ([[LstmStackBptt.StateSession]]). Keras dropout/recurrent_dropout
  * and the rank losses compose (the head-side gradient is injected
  * directly, so no surrogate-target trick is needed).
  *
  * Inference folds POPULATION statistics — re-estimated over the full
  * training set at the final weights, the order-independent analog of
  * Keras' moving average — into the scorer's [[LstmNorm]] moving-stats
  * slots, so the fitted model scores through the SAME distributed
  * staged forward as the pinned-BN inference path (q_lstm_ln).
  *
  * Stacked multi-layer BN TRAINING (the time-distributed inner sites,
  * normalized over batch×time) is not fitted — a documented boundary;
  * those layouts still SCORE via pinned moving stats. */
class LSTMBnTrainer(
    val lagCols: Seq[String],
    val seqLen: Int,
    val targetCol: String,
    val hidden: Int = 8,
    val bidirectional: Boolean = false,
    val lr: Double = 1e-2,
    val epochs: Int = 150,
    val seed: Long = 42L,
    val scaleTarget: Boolean = true,
    val batchFraction: Double = 0.2,
    val batchSize: Int = 32,
    val dropout: Double = 0.0,
    val recurrentDropout: Double = 0.0,
    val loss: String = "mse",
    val mseWeight: Double = 2.0,
    val spearmanWeight: Double = 1.0,
    val rankTau: Double = 1e-3) extends Serializable {

  require(lagCols.size % seqLen == 0,
    s"${lagCols.size} lag columns do not reshape into $seqLen steps")
  require(Set("mse", "spearman", "combined")(loss),
    s"loss must be mse|spearman|combined, got $loss")
  require(batchFraction > 0 && batchFraction <= 1.0,
    s"batchFraction must be in (0, 1], got $batchFraction")

  private val nFeat = lagCols.size / seqLen
  private val cfg = LstmStackBptt.Cfg(nFeat, Seq(hidden),
    bidi = bidirectional)
  private val hd = cfg.headDim
  private val bnOff = cfg.size
  /** Flat size: kernel cells + head, then BN gamma/beta over the state. */
  val size: Int = cfg.size + 2 * hd

  private var w: Array[Double] = _
  private var norm: LstmNorm = _
  private var yMean = 0.0
  private var yStd = 1.0

  def steps: Seq[Seq[String]] = lagCols.grouped(nFeat).toSeq
  def fittedNorm: LstmNorm = norm
  def fittedWeights: Array[Double] = w
  def config: LstmStackBptt.Cfg = cfg
  def targetStats: (Double, Double) = (yMean, yStd)

  /** Batched epoch gradient: one batch = one BN statistics group = one
    * gradient unit (batch-count normalized). The MSE mode is defined as
    * [[RankLoss.combinedGrad]] at mseW=1, spW=0 — dL/dpred = 2(p−y)/b,
    * loss = mean (p−y)² — so the rank losses are the same code path
    * with different weights (delta-linearity by construction). `ep` = 0
    * disables dropout and pins batch composition (the FD spec mode). */
  def gradient(data: DataFrame, p: Array[Double], ep: Long = 0L)
      : (Array[Double], Double) = {
    val (f, t0) = (nFeat, seqLen)
    val c = cfg
    val n = size
    val (bOff, hdd) = (bnOff, hd)
    val bsz = batchSize
    val seed0 = seed
    val anyDrop = (dropout > 0 || recurrentDropout > 0) && ep != 0L
    val (din, drec) = (dropout, recurrentDropout)
    val (mw, sw) = loss match {
      case "mse" => (1.0, 0.0)
      case "spearman" => (0.0, 1.0)
      case _ => (mseWeight, spearmanWeight)
    }
    val tau = rankTau
    val spearmanOnly = loss == "spearman"
    val gamma = Array.tabulate(hdd)(i => p(bOff + i))
    val beta = Array.tabulate(hdd)(i => p(bOff + hdd + i))
    val acc = data.rdd.mapPartitions { it =>
      val acc = new Array[Double](n + 2)
      val part = org.apache.spark.TaskContext.getPartitionId().toLong
      var idx = 0L
      SeqAdam.shuffledBatches(it, bsz, seed0, ep, part).foreach { batch =>
        val b = batch.size
        // the pure Spearman loss is undefined on one row; every other
        // config lets a leftover singleton contribute its MSE term
        if (b >= 2 || !spearmanOnly) {
          val sessions = new Array[LstmStackBptt.StateSession](b)
          val ys = new Array[Double](b)
          val z = new Array[Array[Double]](b)
          var i = 0
          batch.foreach { row =>
            ys(i) = row.getDouble(0)
            val x = Array.tabulate(t0, f)((t, j) =>
              row.getDouble(1 + t * f + j))
            val dr = if (!anyDrop) null
              else LstmBptt.Drop(din, drec,
                SeqAdam.maskSeed(seed0, ep, part, idx))
            idx += 1
            sessions(i) = new LstmStackBptt.StateSession(p, c, x, dr)
            z(i) = sessions(i).state
            i += 1
          }
          val bnF = BatchNorm.forward(z, gamma, beta)
          val preds = Array.tabulate(b) { i2 =>
            var pr = p(c.headBias)
            var u = 0
            while (u < hdd) {
              pr += p(c.headOff + u) * bnF.out(i2)(u); u += 1
            }
            pr
          }
          val (dPred, lossVal) =
            RankLoss.combinedGrad(preds, ys, tau, mw, sw)
          val dBnOut = Array.tabulate(b, hdd)((i2, u) =>
            dPred(i2) * p(c.headOff + u))
          i = 0
          while (i < b) {
            acc(c.headBias) += dPred(i)
            var u = 0
            while (u < hdd) {
              acc(c.headOff + u) += dPred(i) * bnF.out(i)(u); u += 1
            }
            i += 1
          }
          val tmpG = new Array[Double](hdd)
          val tmpB = new Array[Double](hdd)
          val dZ = BatchNorm.backward(bnF, gamma, dBnOut, tmpG, tmpB)
          var u = 0
          while (u < hdd) {
            acc(bOff + u) += tmpG(u)
            acc(bOff + hdd + u) += tmpB(u)
            u += 1
          }
          i = 0
          while (i < b) { sessions(i).backward(dZ(i), acc); i += 1 }
          acc(n) += lossVal
          acc(n + 1) += 1.0
        }
      }
      Iterator.single(acc)
    }.treeReduce({ (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }, depth = 2)
    val cnt = math.max(acc(size + 1), 1.0)
    (Array.tabulate(size)(i => acc(i) / cnt), acc(size) / cnt)
  }

  def fit(df: DataFrame): this.type = {
    val data = df.select((targetCol +: lagCols).map(c =>
      col(c).cast("double")): _*).na.drop()
    data.cache()
    require(data.count() > 0, "no complete rows to fit on")
    if (scaleTarget) {
      val r = data.agg(avg(col(targetCol)),
        stddev_pop(col(targetCol))).collect()(0)
      yMean = r.getDouble(0)
      yStd = math.max(r.getDouble(1), 1e-12)
    }
    val std = data.select(
      ((col(data.columns.head) - lit(yMean)) / lit(yStd)) +:
        data.columns.tail.map(col).toSeq: _*)
    std.cache(); std.count(); data.unpersist()

    val p = new Array[Double](size)
    System.arraycopy(LstmStackBptt.init(cfg, seed), 0, p, 0, cfg.size)
    for (u <- 0 until hd) p(bnOff + u) = 1.0 // gamma=1, beta=0
    val adam = new AdamState(size, lr)
    for (t <- 1 to epochs) {
      val batch = if (batchFraction >= 1.0) std
        else std.sample(withReplacement = false, batchFraction, seed + t)
      val (g0, _) = gradient(batch, p, t)
      adam.update(p, g0, t)
    }
    // population statistics of the final state at the fitted weights
    // (dropout off) — the inference BN fold
    val (f, t0) = (nFeat, seqLen)
    val c = cfg
    val hdd = hd
    val pF = p
    val stats = std.rdd.mapPartitions { it =>
      val s = new Array[Double](2 * hdd + 1)
      it.foreach { row =>
        val x = Array.tabulate(t0, f)((t, j) => row.getDouble(1 + t * f + j))
        val st = new LstmStackBptt.StateSession(pF, c, x).state
        var u = 0
        while (u < hdd) {
          s(u) += st(u); s(hdd + u) += st(u) * st(u); u += 1
        }
        s(2 * hdd) += 1.0
      }
      Iterator.single(s)
    }.treeReduce({ (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }, depth = 2)
    val cnt = math.max(stats(2 * hd), 1.0)
    val movMean = Array.tabulate(hd)(u => stats(u) / cnt)
    val movVar = Array.tabulate(hd)(u =>
      math.max(stats(hd + u) / cnt - movMean(u) * movMean(u), 0.0))
    norm = LstmNorm(Array.tabulate(hd)(u => p(bnOff + u)),
      Array.tabulate(hd)(u => p(bnOff + hd + u)),
      BatchNorm.Eps, movMean, movVar)
    w = p
    std.unpersist()
    this
  }

  /** Appends `prediction` through the SAME distributed staged forward
    * as the pinned-BN inference scorer (population affine folded). */
  def predict(df: DataFrame): DataFrame = {
    require(w != null, "fit first")
    val scored = if (bidirectional) {
      val (fw, bw, wOut, bOut) = LstmStackBptt.toBidi(w, cfg)
      LstmScorer.scoreBidirectional(df, steps, fw, bw, wOut, bOut, norm)
    } else LstmScorer.scoreStacked(df, steps,
      LstmStackBptt.toStacked(w, cfg), Seq(norm))
    if (scaleTarget)
      scored.withColumn("prediction",
        col("prediction") * lit(yStd) + lit(yMean))
    else scored
  }
}
