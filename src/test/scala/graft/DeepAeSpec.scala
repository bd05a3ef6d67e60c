package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

/** Depth-general joint autoencoder (the reference's list-shaped
  * encoder_units / ae_units, autoencoder.py:15-69): finite-difference
  * gradient through multi-stage encoder/decoder/head chains, joint fit
  * quality, and staged-scorer/kernel agreement. */
class DeepAeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deep ae: flat gradient matches central finite differences for a " +
    "2-stage encoder + 2-stage head chain (mirrored decoder), plain AND " +
    "with per-stage dropout masks held fixed") {
    val cfg = DeepAeKernel.Cfg(k = 3, enc = Seq(4, 3), latent = 2,
      head = Seq(3, 2), out = 2)
    val cfgD = cfg.copy(encDrop = Seq(0.3, 0.2), latentDrop = 0.25,
      headDrop = Seq(0.0, 0.4))
    val r = new scala.util.Random(5)
    for ((c, ms) <- Seq((cfg, 0L), (cfgD, 4242L))) {
      val sz = c.size
      val p = Array.fill(sz)(r.nextGaussian() * 0.4)
      val x = Array.fill(3)(r.nextGaussian())
      val xT = Array.fill(3)(r.nextGaussian())
      val ys = Array(0.4, -0.6)
      val acc = new Array[Double](sz)
      DeepAeKernel.run(p, c, x, xT, ys, 1.0, 0.7, acc, ms)
      val eps = 1e-6
      for (i <- 0 until sz) {
        val pp = p.clone(); pp(i) += eps
        val pm = p.clone(); pm(i) -= eps
        val fd = (DeepAeKernel.run(pp, c, x, xT, ys, 1.0, 0.7, null, ms) -
          DeepAeKernel.run(pm, c, x, xT, ys, 1.0, 0.7, null, ms)) /
          (2 * eps)
        assert(math.abs(fd - acc(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
          s"ms=$ms grad mismatch at $i: analytic=${acc(i)} fd=$fd")
      }
    }
  }

  test("deep ae: 2-stage joint fit learns the nonlinear manifold AND the " +
    "target head (R^2 > 0.8); staged scoring equals the kernel forward " +
    "per output") {
    val r = new scala.util.Random(8)
    val rows = (0 until 400).map { i =>
      val t = r.nextGaussian()
      (i.toLong, t + 0.05 * r.nextGaussian(),
        t * t - 1.0 + 0.05 * r.nextGaussian(),
        math.sin(1.5 * t) + 0.05 * r.nextGaussian(),
        t + 0.1 * r.nextGaussian())
    }
    val df = rows.toDF("id", "f0", "f1", "f2", "y")
    val m = new DeepJointAutoencoder(Seq("f0", "f1", "f2"), "y",
      encoderUnits = Seq(8, 5), latentDim = 1, headUnits = Seq(4, 3),
      lr = 0.02, epochs = 200, batchFraction = 1.0)
    val pred = m.fit(df).predict(df)
    assert(pred.columns.contains("prediction") &&
      pred.columns.contains("latent_0"))
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"deep AE target head failed to learn: r2=$r2")

    // staged scorer == kernel forward (driver-side, per row)
    val w = m.fittedWeights
    val c = m.kernelCfg
    val sample = pred.select("f0", "f1", "f2", "prediction")
      .limit(10).collect()
    sample.foreach { row =>
      val x = Array.tabulate(3)(i =>
        (row.getDouble(i) - m.featMeans(i)) / m.featStds(i))
      val acts = new Array[Array[Double]](c.stages.size + 1)
      DeepAeKernel.run(w, c, x, x, Array(0.0), 0.0, 0.0, null,
        actsOut = acts)
      val local = acts.last(0) * m.targetStds(0) + m.targetMeans(0)
      assert(math.abs(local - row.getDouble(3)) < 1e-9,
        s"deep AE scorer and kernel disagree: $local vs ${row.getDouble(3)}")
    }
  }

  test("deep ae: dropout at reference-shaped per-stage rates still " +
    "learns the manifold (denoising + dropout compose)") {
    val r = new scala.util.Random(9)
    val rows = (0 until 400).map { i =>
      val t = r.nextGaussian()
      (i.toLong, t + 0.05 * r.nextGaussian(),
        t * t - 1.0 + 0.05 * r.nextGaussian(),
        math.sin(1.5 * t) + 0.05 * r.nextGaussian(),
        t + 0.1 * r.nextGaussian())
    }
    val df = rows.toDF("id", "f0", "f1", "f2", "y")
    val m = new DeepJointAutoencoder(Seq("f0", "f1", "f2"), "y",
      encoderUnits = Seq(8, 5), latentDim = 1, headUnits = Seq(4),
      encoderDropout = Seq(0.1, 0.1), latentDropout = 0.1,
      headDropout = Seq(0.1), gaussianNoise = 0.035,
      lr = 0.02, epochs = 250, batchFraction = 1.0)
    val pred = m.fit(df).predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.7,
      s"regularized deep AE failed to learn: r2=$r2")
  }
}
