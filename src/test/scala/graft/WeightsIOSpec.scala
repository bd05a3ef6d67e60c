package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{MLPMultiRegressor, MLPRegressor, WeightsIO}

/** Model persistence (the sklearn-pickle role): exact-double JSON
  * round-trips bit-identically, and a loaded estimator scores byte for
  * byte like the fitted one. */
class WeightsIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(sub: String) =
    java.nio.file.Files.createTempDirectory("graft-wio")
      .resolve(sub).toString

  test("section round-trip is BIT-exact, including denormals, extremes " +
    "and negative zero") {
    val gnarly = Array(0.0, -0.0, 1.0 / 3.0, math.Pi, 1e-300, -1e-300,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      4.9e-324, 0.1 + 0.2)
    val p = tmp("gnarly.json")
    WeightsIO.save(p, Map("k" -> "v"), Seq("g" -> gnarly))
    val (meta, sections) = WeightsIO.load(p)
    assert(meta == Map("k" -> "v"))
    val back = sections("g")
    assert(back.length == gnarly.length)
    gnarly.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(back(i)) ==
        java.lang.Double.doubleToRawLongBits(gnarly(i)),
        s"bit drift at $i: ${gnarly(i)} -> ${back(i)}")
    }
  }

  test("non-finite weights refuse to save (a silent NaN artifact would " +
    "poison every downstream scorer)") {
    intercept[IllegalArgumentException] {
      WeightsIO.save(tmp("bad.json"), Map.empty,
        Seq("w" -> Array(1.0, Double.NaN)))
    }
  }

  private def frame = (1 to 120).map { i =>
    val (x1, x2) = ((i % 7).toDouble, (i % 5).toDouble)
    (i.toLong, x1, x2, 3.0 * x1 - 2.0 * x2 + 1.0, 0.5 * x1 + x2)
  }.toDF("id", "x1", "x2", "y", "y2")

  test("MLPRegressor: save -> load -> predict is byte-identical to the " +
    "fitted estimator's predictions") {
    val fitted = new MLPRegressor(Seq("x1", "x2"), "y", hidden = 4,
      lr = 0.05, epochs = 30).fit(frame)
    val p = tmp("mlp.json")
    fitted.save(p)
    val loaded = MLPRegressor.load(p)
    val a = fitted.predict(frame).select("id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = loaded.predict(frame).select("id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(b(k)),
        s"prediction drift for id $k: $v vs ${b(k)}")
    }
    // wrong-family guard
    intercept[IllegalArgumentException] { MLPMultiRegressor.load(p) }
  }

  test("MLPMultiRegressor: save -> load preserves every head and the " +
    "per-output destandardization") {
    val fitted = new MLPMultiRegressor(Seq("x1", "x2"), Seq("y", "y2"),
      hidden = 4, lr = 0.05, epochs = 30).fit(frame)
    val p = tmp("mlp_multi.json")
    fitted.save(p)
    val loaded = MLPMultiRegressor.load(p)
    val cols = Seq("id", "prediction_0", "prediction_1")
    val a = fitted.predict(frame).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val b = loaded.predict(frame).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(a == b, "loaded multi-head predictions must be identical")
  }
}

/** The flat-kernel persistence path: any Array[Double]-layout trainer
  * serializes as one WeightsIO section — pinned here with the deep-MLP
  * kernel: a saved+loaded parameter vector stages byte-identical
  * scoring columns. */
class FlatKernelIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("deep-MLP flat kernel: save -> load -> staged scoring is " +
    "byte-identical on real data") {
    val dims = Seq(3, 4, 3)
    val p = QueriesML.pinnedDeep
    val path = java.nio.file.Files.createTempDirectory("graft-wio")
      .resolve("deep.json").toString
    WeightsIO.save(path,
      Map("family" -> "deep_mlp", "dims" -> dims.mkString(",")),
      Seq("flat" -> p))
    val (meta, sections) = WeightsIO.load(path)
    assert(meta("dims").split(",").map(_.toInt).toSeq == dims)
    val back = sections("flat")
    assert(back.length == p.length && p.indices.forall(i =>
      java.lang.Double.doubleToRawLongBits(back(i)) ==
        java.lang.Double.doubleToRawLongBits(p(i))))
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet").limit(200)
    val feats = Seq("l_quantity", "l_discount", "l_tax")
      .map(c => col(c).cast("double"))
    def score(w: Array[Double]) = graft.ml.DeepMlpScore
      .stage(li, feats, w, dims, 2, swish = false,
        Array(0.0, 0.0), Array(1.0, 1.0))
      .select("prediction_0", "prediction_1")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(score(p) == score(back),
      "loaded kernel must stage identical scoring columns")
  }
}
