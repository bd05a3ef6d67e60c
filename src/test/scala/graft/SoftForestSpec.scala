package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

/** Differentiable NDF (keras_estimators/tree.py:53-384): analytic
  * gradient vs central finite differences, fit quality on a tree-shaped
  * target, and scorer/kernel forward agreement. */
class SoftForestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("soft ndf: flat gradient matches central finite differences") {
    val reg = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2,
      depth = 2, l2Decision = 0.0, l2Leaf = 0.0)
    val r = new scala.util.Random(7)
    val rows = (0 until 8).map(i =>
      (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y", "f0", "f1")
    val masks = Seq(Array(0, 1), Array(0, 1))
    val sz = 2 * (2 * 3 + 3 + 4)
    val p = Array.fill(sz)(r.nextGaussian() * 0.4)
    val temp = 0.7
    val (g, _) = reg.gradient(data, p, masks, temp)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val lp = reg.gradient(data, pp, masks, temp)._2
      val lm = reg.gradient(data, pm, masks, temp)._2
      val fd = (lp - lm) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("soft ndf stochastic regularizers (tree.py:291-293,325-375): " +
    "gradient matches finite differences with the noise sample held " +
    "fixed; inactive config at ep!=0 equals the deterministic path") {
    val reg = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2,
      depth = 2, l2Decision = 0.0, l2Leaf = 0.0,
      inputNoiseStd = 0.2, treeNoiseStd = 0.1, treeDropoutRate = 0.3)
    val r = new scala.util.Random(17)
    val rows = (0 until 8).map(_ =>
      (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y", "f0", "f1").repartition(1)
    val masks = Seq(Array(0, 1), Array(0, 1))
    val sz = 2 * (2 * 3 + 3 + 4)
    val p = Array.fill(sz)(r.nextGaussian() * 0.4)
    val (temp, ep) = (0.7, 5L)
    val (g, _) = reg.gradient(data, p, masks, temp, ep)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val lp = reg.gradient(data, pp, masks, temp, ep)._2
      val lm = reg.gradient(data, pm, masks, temp, ep)._2
      val fd = (lp - lm) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"noisy grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
    // all-zero rates at ep != 0 must equal the ep = 0 deterministic path
    val plain = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2,
      depth = 2, l2Decision = 0.0, l2Leaf = 0.0)
    assert(plain.gradient(data, p, masks, temp, 5L)._2 ==
      plain.gradient(data, p, masks, temp)._2,
      "inactive regularizers must not perturb the gradient")
  }

  test("soft ndf: fit with the reference regularizers on (input noise + " +
    "tree noise + tree dropout) still learns the tree target") {
    val r = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val f2 = r.nextGaussian()
      val y = (if (f0 < 0) { if (f1 < 0) -2.0 else -0.5 }
               else { if (f1 < 0) 0.5 else 2.0 }) + 0.1 * r.nextGaussian()
      (i.toLong, f0, f1, f2, y)
    }
    val df = rows.toDF("id", "f0", "f1", "f2", "y")
    val m = new SoftNdfRegressor(Seq("f0", "f1", "f2"), "y", numTrees = 4,
      depth = 2, lr = 0.1, epochs = 120, inputNoiseStd = 0.05,
      treeNoiseStd = 0.05, treeDropoutRate = 0.1)
    val pred = m.fit(df).predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.75, s"regularized soft NDF failed to learn: r2=$r2")
  }

  test("soft ndf: fit learns an axis-aligned tree target to R^2 > 0.8; " +
    "model forward matches the staged scoring projection") {
    val r = new scala.util.Random(11)
    // depth-2 tree function of (f0, f1) + noise — the model class's
    // home turf (tree.py:274-279)
    val rows = (0 until 500).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val f2 = r.nextGaussian()
      val y = (if (f0 < 0) { if (f1 < 0) -2.0 else -0.5 }
               else { if (f1 < 0) 0.5 else 2.0 }) + 0.1 * r.nextGaussian()
      (i.toLong, f0, f1, f2, y)
    }
    val df = rows.toDF("id", "f0", "f1", "f2", "y")
    val m = new SoftNdfRegressor(Seq("f0", "f1", "f2"), "y", numTrees = 4,
      depth = 2, lr = 0.1, epochs = 120)
    val model = m.fit(df)
    val pred = model.predict(df)
    assert(pred.columns.contains("prediction"))
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"soft NDF failed to learn a tree target: r2=$r2")

    // staged scoring projection == driver-local forward on a sample
    val sample = pred.select("f0", "f1", "f2", "prediction")
      .limit(20).collect()
    sample.foreach { row =>
      val x = Array.tabulate(3)(i =>
        (row.getDouble(i) - model.featMeans(i)) / model.featStds(i))
      val local = model.trees.map(t =>
        SoftForest.treeForward(t, x, model.temperature)).sum /
        model.trees.size * model.yStd + model.yMean
      assert(math.abs(local - row.getDouble(3)) < 1e-9,
        s"scorer and driver forward disagree: $local vs ${row.getDouble(3)}")
    }
  }

  test("soft ndf with a shared MLP trunk (trunk_units): gradient matches " +
    "finite differences through trunk AND trees") {
    val reg = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2,
      depth = 2, l2Decision = 0.0, l2Leaf = 0.0, trunkUnits = Seq(3))
    val r = new scala.util.Random(19)
    val rows = (0 until 8).map(_ =>
      (r.nextGaussian() * 0.5, r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y", "f0", "f1")
    val masks = Seq(Array(0, 1, 2), Array(0, 1, 2))
    val sz = (2 * 3 + 3) + 2 * (3 * 3 + 3 + 4)
    val p = Array.fill(sz)(r.nextGaussian() * 0.4)
    val temp = 0.8
    val (g, _) = reg.gradient(data, p, masks, temp)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val fd = (reg.gradient(data, pp, masks, temp)._2 -
        reg.gradient(data, pm, masks, temp)._2) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"trunk grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("soft ndf with trunk: fit learns; staged trunk+tree scoring " +
    "matches the driver-local forward") {
    val r = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val y = (if (f0 < 0) -1.0 else 1.0) * (if (f1 < 0) 0.5 else 2.0) +
        0.1 * r.nextGaussian()
      (i.toLong, f0, f1, y)
    }
    val df = rows.toDF("id", "f0", "f1", "y")
    val m = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 3,
      depth = 2, lr = 0.1, epochs = 120, trunkUnits = Seq(4))
    val model = m.fit(df)
    assert(model.trunk.size == 1 && model.trunk.head._2.length == 4)
    val pred = model.predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.6, s"trunked soft NDF failed to learn: r2=$r2")
    pred.select("f0", "f1", "prediction").limit(10).collect()
      .foreach { row =>
        val x0 = Array.tabulate(2)(i =>
          (row.getDouble(i) - model.featMeans(i)) / model.featStds(i))
        val tx = model.trunkForward(x0)
        val local = model.trees.map(t =>
          SoftForest.treeForward(t, tx, model.temperature)).sum /
          model.trees.size * model.yStd + model.yMean
        assert(math.abs(local - row.getDouble(2)) < 1e-9,
          s"trunk scorer disagrees: $local vs ${row.getDouble(2)}")
      }
  }

  test("soft ndf: single-tree forest (num_trees=1) fits and scores " +
    "(tests/test_model_estimators.py:419 degenerate case)") {
    val r = new scala.util.Random(47)
    val rows = (0 until 200).map { i =>
      val f0 = r.nextGaussian()
      (i.toLong, f0, r.nextGaussian(),
        (if (f0 < 0) -1.0 else 1.0) + 0.1 * r.nextGaussian())
    }
    val df = rows.toDF("id", "f0", "f1", "y")
    val model = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 1,
      depth = 2, lr = 0.1, epochs = 80).fit(df)
    assert(model.trees.size == 1)
    val pred = model.predict(df)
    assert(pred.count() == 200 && pred.columns.contains("prediction"))
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.6, s"single tree failed to learn a step: r2=$r2")
  }

  test("soft ndf: rank-loss surrogate injection at spW=0, mseW=0.5 " +
    "reproduces the MSE path (delta-linearity identity)") {
    val r = new scala.util.Random(41)
    val rows = (0 until 40).map(i =>
      (i.toLong, r.nextGaussian(), r.nextGaussian(), r.nextGaussian()))
    val df = rows.toDF("id", "f0", "f1", "y").repartition(1)
    def fitted(loss: String) =
      new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2, depth = 2,
        epochs = 10, loss = loss, mseWeight = 0.5, spearmanWeight = 0.0,
        rankBatch = 64).fit(df)
    val wm = fitted("mse"); val wc = fitted("combined")
    (wm.trees zip wc.trees).foreach { case (a, b) =>
      (a.pi zip b.pi).foreach { case (x, yv) =>
        assert(math.abs(x - yv) < 1e-6, s"pi diverged: $x vs $yv") }
      (a.bDec zip b.bDec).foreach { case (x, yv) =>
        assert(math.abs(x - yv) < 1e-6, s"bDec diverged: $x vs $yv") }
    }
  }

  test("soft ndf: feature bagging restricts each tree to its mask; " +
    "temperature anneals to tempEnd") {
    val r = new scala.util.Random(3)
    val rows = (0 until 120).map { i =>
      (i.toLong, r.nextGaussian(), r.nextGaussian(), r.nextGaussian(),
        r.nextGaussian())
    }
    val df = rows.toDF("id", "f0", "f1", "f2", "y")
    val m = new SoftNdfRegressor(Seq("f0", "f1", "f2"), "y", numTrees = 3,
      depth = 2, usedFeaturesRate = 0.5, epochs = 5, tempStart = 2.0,
      tempEnd = 0.5)
    val model = m.fit(df)
    model.trees.foreach { t =>
      assert(t.featIdx.length == 2) // round(3 * 0.5) = 2
      assert(t.featIdx.forall(i => i >= 0 && i < 3))
    }
    assert(math.abs(model.temperature - 0.5) < 1e-12)
  }

  test("soft ndf multi-output (pi matrix (num_leaves, output_units), " +
    "tree.py:127-133,205): joint gradient matches finite differences " +
    "through the SHARED routing; pi blocks are output-major") {
    val reg = new SoftNdfRegressor(Seq("f0", "f1"), "y0",
      extraTargetCols = Seq("y1"), numTrees = 2, depth = 2,
      l2Decision = 0.0, l2Leaf = 0.0)
    val r = new scala.util.Random(13)
    val rows = (0 until 8).map(i =>
      (r.nextGaussian() * 0.5, r.nextGaussian() * 0.5,
        r.nextGaussian(), r.nextGaussian()))
    val data = rows.toDF("y0", "y1", "f0", "f1")
    val masks = Seq(Array(0, 1), Array(0, 1))
    val sz = 2 * (2 * 3 + 3 + 4 * 2) // wDec + bDec + pi(2 outputs)
    val p = Array.fill(sz)(r.nextGaussian() * 0.4)
    val temp = 0.7
    val (g, _) = reg.gradient(data, p, masks, temp)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val lp = reg.gradient(data, pp, masks, temp)._2
      val lm = reg.gradient(data, pm, masks, temp)._2
      val fd = (lp - lm) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"multi grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("soft ndf multi-output joint fit learns two tree-shaped targets " +
    "over shared routing to R^2 > 0.8 each; predictMulti stages the " +
    "leaf probabilities ONCE and agrees with the driver-local forward") {
    val r = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val y0 = (if (f0 < 0) { if (f1 < 0) -2.0 else -0.5 }
                else { if (f1 < 0) 0.5 else 2.0 }) + 0.1 * r.nextGaussian()
      // second target: DIFFERENT leaf values over the same partition
      val y1 = (if (f0 < 0) { if (f1 < 0) 1.0 else 3.0 }
                else { if (f1 < 0) -1.5 else 0.5 }) + 0.1 * r.nextGaussian()
      (i.toLong, f0, f1, y0, y1)
    }
    val df = rows.toDF("id", "f0", "f1", "y0", "y1")
    val m = new SoftNdfRegressor(Seq("f0", "f1"), "y0",
      extraTargetCols = Seq("y1"), numTrees = 4, depth = 2, lr = 0.1,
      epochs = 120)
    val model = m.fit(df)
    val pred = model.predict(df)
    assert(pred.columns.contains("prediction_0") &&
      pred.columns.contains("prediction_1"))
    val r20 = Metrics.r2(pred, "prediction_0", "y0", Seq.empty)
      .collect()(0).getDouble(0)
    val r21 = Metrics.r2(pred, "prediction_1", "y1", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r20 > 0.8 && r21 > 0.8,
      s"joint multi-output NDF fit: r2_0=$r20 r2_1=$r21")
    // staged multi scoring == driver-local per-output forward
    val sample = pred.select("f0", "f1", "prediction_0", "prediction_1")
      .limit(20).collect()
    sample.foreach { row =>
      val x = Array.tabulate(2)(i =>
        (row.getDouble(i) - model.featMeans(i)) / model.featStds(i))
      for (o <- 0 until 2) {
        val local = model.trees.map(t =>
          SoftForest.treeForward(t.copy(pi = t.piM(o)), x,
            model.temperature)).sum / model.trees.size *
          model.yStds(o) + model.yMeans(o)
        assert(math.abs(local - row.getDouble(2 + o)) < 1e-9,
          s"multi scorer and driver forward disagree on output $o")
      }
    }
  }

  test("soft ndf trainable input BN (tree.py:323): gradient incl. the " +
    "gamma/beta tail matches central finite differences on RAW-scale " +
    "features (batch statistics are data-only, so FD is exact)") {
    val reg = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 2,
      depth = 2, l2Decision = 0.0, l2Leaf = 0.0, useInputBn = true)
    val r = new scala.util.Random(7)
    // deliberately unstandardized: offset and scale-skewed features
    val rows = (0 until 8).map(_ =>
      (r.nextGaussian() * 0.5, r.nextGaussian() * 30.0 + 100.0,
        r.nextGaussian() * 0.01 - 0.5))
    val data = rows.toDF("y", "f0", "f1")
    val masks = Seq(Array(0, 1), Array(0, 1))
    val core = 2 * (2 * 3 + 3 + 4)
    val sz = core + 4
    val p = Array.tabulate(sz)(i =>
      if (i < core) r.nextGaussian() * 0.4
      else if (i < core + 2) 1.0 + r.nextGaussian() * 0.1
      else r.nextGaussian() * 0.1)
    val temp = 0.7
    val (g, _) = reg.gradient(data, p, masks, temp)
    val eps = 1e-6
    for (i <- 0 until sz) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val fd = (reg.gradient(data, pp, masks, temp)._2 -
        reg.gradient(data, pm, masks, temp)._2) / (2 * eps)
      assert(math.abs(fd - g(i)) <= 1e-5 * math.max(1.0, math.abs(fd)),
        s"bn grad mismatch at $i: analytic=${g(i)} fd=$fd")
    }
  }

  test("soft ndf trainable input BN: fit learns the tree target from " +
    "RAW scale-skewed features, and the population fold keeps the " +
    "staged scorer equal to the driver forward") {
    val r = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val y = (if (f0 < 0) { if (f1 < 0) -2.0 else -0.5 }
               else { if (f1 < 0) 0.5 else 2.0 }) + 0.1 * r.nextGaussian()
      // raw columns carry offsets and a 200x scale spread
      (i.toLong, f0 * 40.0 + 300.0, f1 * 0.2 - 3.0, y)
    }
    val df = rows.toDF("id", "f0", "f1", "y")
    val m = new SoftNdfRegressor(Seq("f0", "f1"), "y", numTrees = 4,
      depth = 2, lr = 0.1, epochs = 120, useInputBn = true)
    val model = m.fit(df)
    val pred = model.predict(df)
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"input-BN soft NDF failed to learn: r2=$r2")
    val sample = pred.select("f0", "f1", "prediction").limit(20).collect()
    sample.foreach { row =>
      val x = Array.tabulate(2)(i =>
        (row.getDouble(i) - model.featMeans(i)) / model.featStds(i))
      val local = model.trees.map(t =>
        SoftForest.treeForward(t, x, model.temperature)).sum /
        model.trees.size * model.yStd + model.yMean
      assert(math.abs(local - row.getDouble(2)) < 1e-9,
        s"bn-folded scorer and driver forward disagree")
    }
  }

  test("soft ndf input BN, strict-Keras moving-average mode: training " +
    "identical to population mode, folded (mean, std) slots differ, and " +
    "the unchanged staged scorer still learns the tree target") {
    val r = new scala.util.Random(13)
    val rows = (0 until 400).map { i =>
      val f0 = r.nextGaussian(); val f1 = r.nextGaussian()
      val y = (if (f0 < 0) { if (f1 < 0) -2.0 else -0.5 }
               else { if (f1 < 0) 0.5 else 2.0 }) + 0.1 * r.nextGaussian()
      (i.toLong, f0 * 40.0 + 300.0, f1 * 0.2 - 3.0, y)
    }
    // one partition: cross-fit comparison needs a deterministic reduce
    val df = rows.toDF("id", "f0", "f1", "y").coalesce(1)
    // momentum 0.9: at this fixture's ~300 effective Keras batch steps
    // the default 0.99 EMA retains ~5% of its (0,1) init — the same
    // early-training bias real Keras has — which shifts the folded mean
    // by ~0.4σ on the 300-offset raw feature; 0.9 decays the init fully
    // (0.9^300 ≈ 2e-14), as a Keras user would configure at this scale
    def fitWith(mode: String) = new SoftNdfRegressor(Seq("f0", "f1"), "y",
      numTrees = 3, depth = 2, lr = 0.1, epochs = 100, useInputBn = true,
      bnInference = mode, bnMomentum = 0.9).fit(df)
    val pop = fitWith("population")
    val ma = fitWith("moving_average")
    // the flag only changes the folded inference statistics
    pop.trees.zip(ma.trees).foreach { case (a, b) =>
      assert(a.wDec.map(_.toSeq).toSeq == b.wDec.map(_.toSeq).toSeq)
      assert(a.pi.sameElements(b.pi))
    }
    assert(!pop.featMeans.sameElements(ma.featMeans) ||
      !pop.featStds.sameElements(ma.featStds),
      "moving-average mode must produce different folded stats")
    val r2 = Metrics.r2(ma.predict(df), "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"MA-mode scorer failed to learn: r2=$r2")
  }
}
