package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

case class MLRow(id: Long, f0: Double, f1: Double, f2: Double, y: Double)

/** ML-surface tests: MLP learns a learnable function (shape/contract
  * checks port tests/test_model_estimators.py:20-45), PCA captures
  * variance in order, embedding harness handles nulls/batches/templates
  * (tests/test_feature_transformers.py:163-249). */
class MLSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rng = new scala.util.Random(42)
  val data: Seq[MLRow] = (0 until 300).map { i =>
    val f = Array.fill(3)(rng.nextGaussian())
    MLRow(i.toLong, f(0), f(1), f(2),
      2.0 * f(0) - 1.0 * f(1) + 0.5 * f(2) + 0.05 * rng.nextGaussian())
  }

  test("mlp: fit reduces error to R^2 > 0.8 on a linear target; " +
    "prediction column name contract (keras_estimators/base.py:137-150)") {
    val df = data.toDF()
    val m = new MLPRegressor(Seq("f0", "f1", "f2"), "y", hidden = 8,
      lr = 0.05, epochs = 120)
    val pred = m.fit(df).predict(df)
    assert(pred.columns.contains("prediction"))
    val r2 = Metrics.r2(pred, "prediction", "y", Seq.empty)
      .collect()(0).getDouble(0)
    assert(r2 > 0.8, s"MLP failed to learn: r2=$r2")
  }

  test("mlp: scoring with pinned weights is a pure projection " +
    "(no shuffle in the plan)") {
    val df = data.toDF()
    val m = new MLPRegressor(Seq("f0", "f1", "f2"), "y")
    val scored = df.select(m.predictColumn(QueriesML.pinned,
      Seq(col("f0"), col("f1"), col("f2"))).as("score"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(scored.count() == 300)
  }

  test("pca: dim_0 captures at least as much variance as dim_1 " +
    "(dimreduction.py naming contract dim_{i})") {
    val df = data.toDF()
    val out = DimReducer(Seq("f0", "f1", "f2"), 2).fitTransform(df)
    assert(out.columns.contains("dim_0") && out.columns.contains("dim_1"))
    val r = out.agg(var_pop(col("dim_0")), var_pop(col("dim_1"))).collect()(0)
    assert(r.getDouble(0) >= r.getDouble(1))
  }

  test("embedding: nulls → zero vectors, template applied, dims from " +
    "embedder (test_feature_transformers.py:163-249)") {
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String]), (3L, "xyz"))
      .toDF("id", "text")
    val out = EmbeddingTransformer("text", MockEmbedder.apply,
      batchSize = 2, dim = 2).transform(df)
      .orderBy("id")
      .select(col("text_embedding")).collect()
      .map(_.getSeq[Float](0).toSeq)
    assert(out(0) == Seq(2.0f, ('a' + 'b').toFloat % 100))
    assert(out(1) == Seq(0.0f, 0.0f))
    assert(out(2).head == 3.0f)
    // template: "Company sector: {}" (embedding.py:147-153)
    val tmpl = EmbeddingTransformer("text", MockEmbedder.apply,
      batchSize = 2, template = Some("S: {}"), dim = 2)
      .transform(Seq((1L, "x")).toDF("id", "text"))
      .select(col("text_embedding")).collect()(0).getSeq[Float](0)
    assert(tmpl.head == 4.0f) // "S: x".length
  }

  test("multimodal: stub decode produces fixed-dim vectors, nulls → zero") {
    import graft.multimodal.BinaryPipeline
    val df = Seq((1L, "hello"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val media = BinaryPipeline.synthesizeMedia(df, "text")
    val out = BinaryPipeline.extractFeatures(media, "media", dim = 4)
      .orderBy("id").select(col("media_features")).collect()
      .map(_.getSeq[Float](0).toSeq)
    assert(out(0).size == 4 && out(0).sum > 0)
    assert(out(1) == Seq(0.0f, 0.0f, 0.0f, 0.0f))
  }
}

/** StandardScaler / sequence reshape / row-predictor / cortex-search. */
class MetaSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("standard scaler: mean 0, pop-std 1 (keras_estimators/base.py:89-100)") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val out = graft.operators.StandardScaler(Seq("x")).transform(df)
    val r = out.agg(avg(col("x_std")), stddev_pop(col("x_std"))).collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-12 &&
      math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("sequence reshape: lag-major columns -> [seq][feat] tensor " +
    "(sequence.py:26-40)") {
    import graft.operators.SequenceReshape
    val df = Seq((1.0, 2.0, 3.0, 4.0)).toDF("a_lag2", "b_lag2", "a_lag1", "b_lag1")
    val t = df.select(SequenceReshape.toSequenceTensor(
      Seq("a_lag2", "b_lag2", "a_lag1", "b_lag1"), seqLen = 2).as("seq"))
      .collect()(0).getSeq[Seq[Double]](0)
    assert(t == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("row predictor: mock fn applied per row with batching; " +
    "null inputs become empty strings (dspymator.py:361-417)") {
    val df = Seq((1L, "hello"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val mock: Map[String, String] => Map[String, String] =
      kw => Map("out" -> ("<" + kw("text") + ">"))
    val got = graft.ml.RowPredictor(Seq("text"), Seq("out"), mock,
      batchSize = 1, concurrency = 2).transform(df)
      .orderBy("id").select("out").collect().map(_.getString(0)).toSeq
    assert(got == Seq("<hello>", "<>"))
  }

  test("cortex search: returns the candidate with best validation R2 " +
    "(keras_cortex.py:96-143 shape)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val x = rng.nextGaussian()
      MLRow(i.toLong, x, rng.nextGaussian(), 0.0, 2.0 * x)
    }
    val df = rows.toDF()
    val res = graft.ml.CortexSearch.search(df, df, Seq("f0", "f1", "f2"),
      "y", hiddenCandidates = Seq(2, 8), epochs = 60)
    assert(res.history.size == 2)
    assert(res.bestR2 == res.history.map(_._2).max)
  }
}
