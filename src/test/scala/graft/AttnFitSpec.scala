package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

/** Transformer encoder training (transformer.py:108-245): gradient-check
  * of the flat BPTT kernel, kernel≡scorer forward agreement, and
  * fit-quality on the same AR(2) fixture the LSTM trainer learns. */
class AttnFitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("attn bptt kernel: analytic gradient matches central finite " +
    "differences over every parameter") {
    val (f, t, h, ff) = (2, 3, 3, 4)
    val sz = AttnBptt.size(f, t, h, ff)
    val r = new scala.util.Random(11)
    val w = Array.fill(sz)(r.nextGaussian() * 0.4)
    val x = Array.fill(t, f)(r.nextGaussian())
    val y = 0.4
    val acc = new Array[Double](sz)
    AttnBptt.run(w, f, h, ff, x, y, acc)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val wp = w.clone(); wp(i) += eps
      val wm = w.clone(); wm(i) -= eps
      def loss(wv: Array[Double]) = {
        val d = AttnBptt.run(wv, f, h, ff, x, y, null) - y
        0.5 * d * d
      }
      val fd = (loss(wp) - loss(wm)) / (2 * eps)
      assert(math.abs(fd - acc(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"grad mismatch at $i: analytic=${acc(i)} fd=$fd")
    }
  }

  test("attn bptt kernel forward matches the distributed AttnScorer " +
    "full-block forward pass") {
    val (f, t, h, ff) = (2, 3, 3, 4)
    val sz = AttnBptt.size(f, t, h, ff)
    val r = new scala.util.Random(13)
    val w = Array.fill(sz)(r.nextGaussian() * 0.3)
    val x = Array.fill(t, f)(r.nextGaussian())
    val cols = (0 until t).flatMap(ti => (0 until f).map(fi => s"x${ti}_$fi"))
    val row = org.apache.spark.sql.Row.fromSeq(
      0L +: (0 until t).flatMap(ti => (0 until f).map(fi => x(ti)(fi))))
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType) +:
      cols.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.DoubleType)))
    val sdf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
    val steps = cols.grouped(f).toSeq
    val scored = AttnScorer.score(sdf, steps,
        AttnBptt.toWeights(w, f, t, h, ff))
      .select("prediction").collect()(0).getDouble(0)
    assert(math.abs(scored - AttnBptt.forward(w, f, h, ff, x)) < 1e-12,
      "trainer forward and scorer disagree")
  }

  test("attn: fit learns the synthetic AR(2) series to R^2 > 0.8; " +
    "fitted weights score through the distributed forward pass") {
    val r = new scala.util.Random(4)
    val series = new Array[Double](620)
    for (i <- 2 until series.length)
      series(i) = 1.4 * series(i - 1) - 0.45 * series(i - 2) +
        0.3 * r.nextGaussian()
    val rows = (4 until 600).map { i =>
      (i.toLong, series(i - 4), series(i - 3), series(i - 2), series(i - 1),
        series(i))
    }
    val df = rows.toDF("id", "lag4", "lag3", "lag2", "lag1", "y")
    val m = new AttnTrainer(Seq("lag4", "lag3", "lag2", "lag1"), seqLen = 4,
      targetCol = "y", dModel = 6, ffDim = 12, lr = 0.02, epochs = 200)
    val pred = m.fit(df).predict(df)
    assert(pred.columns.contains("prediction"))
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"transformer failed to learn AR(2): r2=$r2")
  }
}
