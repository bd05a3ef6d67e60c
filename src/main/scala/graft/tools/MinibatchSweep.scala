package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics behind the minibatch-default decision: fit
  * quality (R² on the training fixture) at batchFraction ∈ {1.0, 0.2,
  * 0.1} with the SAME epoch counts the fit tests use, across the five
  * trainable estimators. The reference trains minibatch-32 full-pass
  * epochs (keras base.py:68); this engine's `batchFraction` is one
  * aggregated update per epoch over a seeded sample, so fraction f at
  * equal epochs touches f× the rows. The sweep answers: does quality
  * hold at ≤1/5 of the aggregated rows per epoch? */
object MinibatchSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ml._

    def r2Of(pred: org.apache.spark.sql.DataFrame): Double =
      Metrics.r2(pred, "prediction", "y", Seq.empty)
        .collect()(0).getDouble(0)

    val r = new scala.util.Random(4)
    val series = new Array[Double](620)
    for (i <- 2 until series.length)
      series(i) = 1.4 * series(i - 1) - 0.45 * series(i - 2) +
        0.3 * r.nextGaussian()
    val seqRows = (4 until 600).map { i =>
      (i.toLong, series(i - 4), series(i - 3), series(i - 2),
        series(i - 1), series(i))
    }
    val seqDf = seqRows.toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
      .cache()
    val lags = Seq("lag4", "lag3", "lag2", "lag1")

    val r2b = new scala.util.Random(19)
    val tabRows = (0 until 400).map { i =>
      val f0 = r2b.nextGaussian(); val f1 = r2b.nextGaussian()
      (i.toLong, f0, f1, f0 * f1 + 0.05 * r2b.nextGaussian())
    }
    val tabDf = tabRows.toDF("id", "f0", "f1", "y").cache()

    val r3 = new scala.util.Random(8)
    val aeRows = (0 until 400).map { i =>
      val t = r3.nextGaussian()
      (i.toLong, t + 0.05 * r3.nextGaussian(),
        t * t - 1.0 + 0.05 * r3.nextGaussian(),
        math.sin(1.5 * t) + 0.05 * r3.nextGaussian(),
        t + 0.1 * r3.nextGaussian())
    }
    val aeDf = aeRows.toDF("id", "f0", "f1", "f2", "y").cache()

    for (bf <- Seq(1.0, 0.2, 0.1)) {
      val mlp = r2Of(new MLPRegressor(Seq("f0", "f1"), "y", hidden = 16,
        lr = 0.01, epochs = 300, batchFraction = bf).fit(tabDf)
        .predict(tabDf))
      val deep = r2Of(new DeepMLPRegressor(Seq("f0", "f1"), "y",
        layers = Seq(8, 8), lr = 0.01, epochs = 400, batchFraction = bf)
        .fit(tabDf).predict(tabDf))
      val lstm = r2Of(new LSTMTrainer(lags, 4, "y", hidden = 6, lr = 0.02,
        epochs = 150, batchFraction = bf).fit(seqDf).predict(seqDf))
      val attn = r2Of(new AttnTrainer(lags, 4, "y", dModel = 8, ffDim = 16,
        preNorm = true, lr = 0.02, epochs = 200, numHeads = 4,
        attnPool = true, mlpUnits = Seq(8), batchFraction = bf).fit(seqDf)
        .predict(seqDf))
      val ae = r2Of(new JointAutoencoder(Seq("f0", "f1", "f2"), "y",
        latentDim = 1, encoderHidden = 8, headHidden = 4, lr = 0.02,
        epochs = 300, seed = 1L, batchFraction = bf).fit(aeDf)
        .predict(aeDf))
      println(f"bf=$bf%4.2f  mlp=$mlp%6.3f deep=$deep%6.3f " +
        f"lstm=$lstm%6.3f attn=$attn%6.3f ae=$ae%6.3f")
    }
    spark.stop()
  }
}
