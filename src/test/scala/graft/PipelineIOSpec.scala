package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Pipeline-level persistence (VERDICT r10 item 3): the composed
  * feature chain saves → loads → transforms bit-identically on real
  * data — the sklearn persist-the-whole-Pipeline analog
  * (README.md:117-162), in the same WeightsIO container as the
  * estimator families. */
class PipelineIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(sub: String) =
    java.nio.file.Files.createTempDirectory("graft-pio")
      .resolve(sub).toString

  private lazy val li =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  private val ord = Seq("l_shipdate", "l_orderkey", "l_linenumber")

  /** The flagship chain (SparkEntry.entry — the reference README
    * pipeline shape). */
  private def entryPipeline = Pipeline(Seq(
    LogReturnTransformer(Seq("l_extendedprice"), "l_suppkey", ord),
    RankTransformer(Seq("l_extendedprice_logreturn"), "l_shipdate"),
    LagTransformer(Seq("l_extendedprice_logreturn_rank"), Seq(1, 2),
      "l_suppkey", ord),
    MovingAverageTransformer(Seq("l_extendedprice_logreturn_rank"),
      Seq(4), "l_suppkey", ord)))

  private def collectOut(df: DataFrame, cols: Seq[String])
      : Map[(Long, Long), Seq[Option[Long]]] =
    df.select((Seq("l_orderkey", "l_linenumber") ++ cols).map(col): _*)
      .collect().map { r =>
        (r.getLong(0), r.getInt(1).toLong) -> cols.indices.map { i =>
          if (r.isNullAt(i + 2)) None
          else Some(java.lang.Double.doubleToRawLongBits(
            r.getDouble(i + 2)))
        }
      }.toMap

  test("flagship chain: save -> load -> transform is bit-identical " +
    "(nulls included) on lineitem") {
    val p = entryPipeline
    val path = tmp("entry.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded.outputNames == p.outputNames,
      "loaded pipeline must expose the same output surface")
    val outCols = p.outputNames
    val a = collectOut(p.transform(li), outCols)
    val b = collectOut(loaded.transform(li), outCols)
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(v == b(k), s"output bits drifted for row $k")
    }
  }

  test("the loaded pipeline compiles to the IDENTICAL Catalyst plan " +
    "(canonicalized optimized-plan equality), which is WHY output is " +
    "bit-identical") {
    val p = entryPipeline
    val path = tmp("plan.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    val a = p.transform(li).queryExecution.optimizedPlan.canonicalized
    val b = loaded.transform(li).queryExecution.optimizedPlan.canonicalized
    assert(a == b, "save -> load must not perturb the plan")
  }

  test("scaling + horizontal stages round-trip (minmax, standardize, " +
    "gaussianize, groupstats, ewma, rolling corr)") {
    val p = Pipeline(Seq(
      MinMaxScaler(Seq("l_quantity"), "_mm"),
      StandardScaler(Seq("l_tax"), "_z"),
      Gaussianizer(Seq("l_discount"), "l_returnflag",
        Seq("l_orderkey", "l_linenumber"), "_g"),
      GroupStatsTransformer(Map("px" -> Seq("l_quantity_mm", "l_tax_z")),
        Seq("mean", "std", "range")),
      EwmaTransformer(Seq("l_extendedprice"), span = 4.0, lookback = 3,
        tickerCol = "l_suppkey", orderCols = ord),
      RollingCorrTransformer("l_quantity", "l_extendedprice", Seq(3),
        "l_suppkey", ord),
      RollingStatsTransformer(Seq("l_quantity"), Seq(3), "l_suppkey",
        ord, Seq("std", "max"))))
    val path = tmp("scaling.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded == p, "config-complete stages must decode structurally " +
      "equal (case-class equality)")
    val outCols = Seq("l_quantity_mm", "l_tax_z", "l_discount_g",
      "px_groupstats_mean", "l_extendedprice_ewma",
      "l_quantity_l_extendedprice_corr3", "l_quantity_std3")
    val a = collectOut(p.transform(li), outCols)
    val b = collectOut(loaded.transform(li), outCols)
    assert(a == b, "loaded chain must transform bit-identically")
  }

  test("encoder + solver stages round-trip: target encode, robust, " +
    "winsorize, quantile bin, neutralize, penalize") {
    val p = Pipeline(Seq(
      TargetEncoder(Seq("l_returnflag"), "l_extendedprice",
        smoothing = 10.0, suffix = Some("s")),
      RobustScaler(Seq("l_quantity"), "l_returnflag"),
      Winsorizer(Seq("l_tax"), "l_returnflag", lo = 0.1, hi = 0.9,
        approx = true, accuracy = 5000),
      QuantileBinner("l_extendedprice", 4, Seq("l_returnflag"), "px_bin"),
      graft.solvers.FeatureNeutralizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_tax"), Seq(0.5), "era", "rid"),
      graft.solvers.FeaturePenalizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_tax"), Seq(0.1), "era", "rid",
        lr = 1e-3, maxIters = 10, tol = 0.0)))
    val path = tmp("encoders.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded == p, "all six stages must decode structurally equal")
    // transform equality over the cheap prefix (encode/scale/win/bin)
    val prefix = Pipeline(p.stages.take(4))
    val loadedPrefix = Pipeline(loaded.stages.take(4))
    val outCols = Seq("l_returnflag_te_s", "l_quantity_robust",
      "l_tax_wins")
    val a = collectOut(prefix.transform(li), outCols)
    val b = collectOut(loadedPrefix.transform(li), outCols)
    assert(a == b, "loaded encoder chain must transform bit-identically")
  }

  test("text-analysis + PCA stages round-trip structurally and " +
    "transform bit-identically on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Pipeline(Seq(
      graft.text.TextStatsTransformer("text", "ts"),
      graft.text.LangIdTransformer("text"),
      graft.text.QualityFilterTransformer("text", "qf", minWords = 10,
        maxWords = 200),
      graft.text.RepetitionTransformer("text")))
    val path = tmp("text.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded == p)
    val a = p.transform(docs).select("doc_id", "ts_quality", "lang_pred",
      "qf_keep", "rep_dup2_frac").collect().map(_.toSeq).toSet
    val b = loaded.transform(docs).select("doc_id", "ts_quality",
      "lang_pred", "qf_keep", "rep_dup2_frac").collect()
      .map(_.toSeq).toSet
    assert(a == b, "loaded text chain must transform identically")
    // PCA: config-complete (fit-on-transform eigens), round-trips too
    val pca = Pipeline(Seq(graft.ml.DimReducer(
      Seq("l_quantity", "l_discount", "l_tax"), 2)))
    val pcaPath = tmp("pca.json")
    PipelineIO.save(pcaPath, pca)
    assert(PipelineIO.load(pcaPath) == pca)
  }

  test("nested pipelines flatten on save (associative composition) and " +
    "transform identically") {
    val nested = Pipeline(Seq(
      Pipeline(Seq(
        LogReturnTransformer(Seq("l_extendedprice"), "l_suppkey", ord),
        RankTransformer(Seq("l_extendedprice_logreturn"), "l_shipdate"))),
      MovingAverageTransformer(Seq("l_extendedprice_logreturn_rank"),
        Seq(4), "l_suppkey", ord)))
    val path = tmp("nested.json")
    PipelineIO.save(path, nested)
    val loaded = PipelineIO.load(path)
    assert(loaded.stages.size == 3, "nested pipeline must flatten")
    assert(loaded.outputNames == nested.outputNames)
    val outCols = Seq("l_extendedprice_logreturn_rank_ma4")
    assert(collectOut(nested.transform(li), outCols) ==
      collectOut(loaded.transform(li), outCols))
  }

  test("a stage with no codec is rejected at save time, and " +
    "non-pipeline artifacts refuse to load") {
    val custom = new GraftTransformer {
      def transform(df: DataFrame): DataFrame = df
      def outputNames: Seq[String] = Nil
    }
    intercept[IllegalArgumentException] {
      PipelineIO.save(tmp("bad.json"), Pipeline(Seq(custom)))
    }
    val other = tmp("other.json")
    graft.ml.WeightsIO.save(other, Map("family" -> "mlp"), Seq.empty)
    intercept[IllegalArgumentException] { PipelineIO.load(other) }
  }

  // ---- whole-fitted-pipeline persistence (VERDICT r11 item 1): the
  // chain AND the trained final estimator in ONE artifact, the
  // reference's sklearn whole-Pipeline pickle (README.md:117-162,
  // tests/test_model_estimators.py:545-576) ----

  test("ONE artifact for the README chain + trained deep-MLP head: " +
    "save -> load -> score is bit-identical") {
    val chain = entryPipeline
    val feats = Seq("l_extendedprice_logreturn_rank_lag1",
      "l_extendedprice_logreturn_rank_lag2",
      "l_extendedprice_logreturn_rank_ma4")
    // the reference's one-call make_pipeline(...).fit(X, y) shape
    val full = FitPipeline.fit(chain.stages, li, d =>
      new graft.ml.DeepMLPRegressor(feats, "l_quantity",
        layers = Seq(4, 3), lr = 0.02, epochs = 5)
        .fit(d.na.drop(feats :+ "l_quantity")))
    val path = tmp("full_with_head.json")
    PipelineIO.save(path, full)
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(path)),
      "the whole fitted pipeline must be one artifact file")
    val loaded = PipelineIO.load(path)
    assert(loaded.outputNames == full.outputNames)
    assert(loaded.stages.last.isInstanceOf[ModelStage],
      "the estimator stage must rebuild as a ModelStage")
    val a = collectOut(full.transform(li), Seq("prediction"))
    val b = collectOut(loaded.transform(li), Seq("prediction"))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(v == b(k), s"prediction bits drifted for row $k")
    }
  }

  test("a multi-output estimator head embeds too (mlp_multi payload " +
    "inside the pipeline artifact)") {
    import spark.implicits._
    val r = new scala.util.Random(5)
    val df = (0 until 200).map { i =>
      val (f0, f1) = (r.nextGaussian(), r.nextGaussian())
      (i.toLong, i.toLong, f0, f1, f0 + f1, f0 - f1)
    }.toDF("l_orderkey", "l_linenumber", "f0", "f1", "y0", "y1")
    val head = new graft.ml.MLPMultiRegressor(Seq("f0", "f1"),
      Seq("y0", "y1"), hidden = 4, epochs = 5, lr = 0.02).fit(df)
    val p = Pipeline(Seq(
      StandardScaler(Seq("f0"), "_z"), ModelStage(head)))
    val path = tmp("multi_head.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded.outputNames ==
      Seq("f0_z", "prediction_0", "prediction_1"))
    def m(q: Pipeline) = q.transform(df)
      .select("l_orderkey", "prediction_0", "prediction_1")
      .collect().map(r => r.getLong(0) -> (
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toMap
    assert(m(p) == m(loaded), "both heads must score bit-identically")
  }

  test("a MID-chain estimator stage round-trips: model head feeding a " +
    "downstream transformer (the stacking shape) saves/loads/scores " +
    "bit-identically") {
    val chain = entryPipeline
    val feats = Seq("l_extendedprice_logreturn_rank_lag1",
      "l_extendedprice_logreturn_rank_ma4")
    val train = chain.transform(li).na.drop(feats :+ "l_quantity")
    val head = new graft.ml.MLPRegressor(feats, "l_quantity", hidden = 3,
      lr = 0.02, epochs = 5).fit(train)
    // estimator in the MIDDLE: its prediction column feeds a rank stage
    val full = Pipeline(chain.stages ++ Seq(ModelStage(head),
      RankTransformer(Seq("prediction"), "l_shipdate")))
    val path = tmp("mid_chain.json")
    PipelineIO.save(path, full)
    val loaded = PipelineIO.load(path)
    assert(loaded.outputNames == full.outputNames)
    val outCols = Seq("prediction", "prediction_rank")
    val a = collectOut(full.transform(li), outCols)
    val b = collectOut(loaded.transform(li), outCols)
    assert(a == b, "mid-chain estimator output and the downstream " +
      "rank must both round-trip bit-identically")
  }

  test("function-carrying transformers persist by registered transport " +
    "NAME and re-wire at load; bare lambdas are rejected with a " +
    "registry pointer") {
    graft.ml.Transports.registerEmbedder("pio-mock",
      graft.ml.MockEmbedder.apply)
    graft.ml.Transports.registerPredictor("pio-upper",
      kw => Map("upper" -> kw.getOrElse("text", "").toUpperCase))
    val p = Pipeline(Seq(
      graft.ml.EmbeddingTransformer.named("pio-mock", "text",
        dim = graft.ml.MockEmbedder.dim, batchSize = 50),
      graft.ml.RowPredictor.named("pio-upper", Seq("text"),
        Seq("upper"), batchSize = 10, concurrency = 2)))
    val path = tmp("transports.json")
    PipelineIO.save(path, p)
    val loaded = PipelineIO.load(path)
    assert(loaded.outputNames == Seq("text_embedding", "upper"))
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta gamma")).toDF("id", "text")
    val out = loaded.transform(docs)
      .select("id", "text_embedding", "upper").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0)._2 == Seq(5.0f,
      ("alpha".map(_.toInt.toLong).sum % 100).toFloat))
    assert(out(1)._3 == "BETA GAMMA")
    // bare lambda: rejected at save with the registry pointer
    val bare = graft.ml.EmbeddingTransformer("text",
      graft.ml.MockEmbedder.apply, 50, None, 2)
    val e = intercept[IllegalArgumentException] {
      PipelineIO.save(tmp("bare.json"), Pipeline(Seq(bare)))
    }
    assert(e.getMessage.contains("registerEmbedder"))
    // unregistered name at load: friendly error naming the transport
    val orphan = Pipeline(Seq(graft.ml.EmbeddingTransformer("text",
      graft.ml.MockEmbedder.apply, 50, None, 2, Some("never-registered"))))
    val orphanPath = tmp("orphan.json")
    PipelineIO.save(orphanPath, orphan)
    val e2 = intercept[IllegalArgumentException] {
      PipelineIO.load(orphanPath)
    }
    assert(e2.getMessage.contains("never-registered"))
  }

  test("ModelCodecs registry covers every persisted family, and " +
    "directly-constructed models (bottleneck, soft forest) embed too") {
    assert(graft.ml.ModelCodecs.loaders.keySet == Set(
      "mlp", "mlp_multi", "deep_mlp", "deep_mlp_multi", "lstm",
      "lstm_multi", "attn", "attn_multi", "joint_ae", "bn_ae",
      "deep_ae", "deep_bn_ae", "bottleneck", "soft_forest"),
      "every family with a standalone load() must be loadable from a " +
        "pipeline-embedded payload")
    val bn = graft.ml.BottleneckModel(graft.ml.BottleneckWeights(
      means = Array(10.0, 0.05),
      loadings = Array(Array(0.8, -0.6), Array(0.6, 0.8)),
      head = Array(0.5, -0.25), headBias = 0.125),
      Seq("l_quantity", "l_discount"))
    val sf = graft.ml.SoftForestModel(
      trees = Seq(graft.ml.SoftTreeWeights(Array(0, 1),
        Array(Array(0.5), Array(-0.25)), Array(0.125),
        Array(1.0, -1.0), null)),
      trunk = Nil, featMeans = Array(10.0, 0.05),
      featStds = Array(5.0, 0.03), temperature = 1.0, yMean = 2.0,
      yStd = 3.0, featureCols = Seq("l_quantity", "l_discount"))
    for ((m, tag) <- Seq((bn, "bn"), (sf, "sf"))) {
      val p = Pipeline(Seq(ModelStage(m)))
      val path = tmp(s"direct_$tag.json")
      PipelineIO.save(path, p)
      val loaded = PipelineIO.load(path)
      val a = collectOut(m.predict(li), Seq("prediction"))
      val b = collectOut(loaded.transform(li), Seq("prediction"))
      assert(a == b, s"$tag: embedded round-trip must score bit-identically")
    }
  }

  test("a truncated artifact fails with the path and the missing key, " +
    "not a bare NoSuchElementException") {
    val path = tmp("truncated.json")
    graft.ml.WeightsIO.save(path,
      Map("family" -> "pipeline", "n" -> "2",
        "s0.kind" -> "minmax", "s0.features" -> "[\"a\"]",
        "s0.suffix" -> "_mm"), Seq.empty)
    val e = intercept[IllegalArgumentException] { PipelineIO.load(path) }
    assert(e.getMessage.contains("s1.kind") &&
      e.getMessage.contains(path))
  }
}
