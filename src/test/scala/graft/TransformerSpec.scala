package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Stages whose generated method exceeds HotSpot's 8000-byte JIT
      // threshold would run as INTERPRETED bytecode (measured 4x slower
      // on the deep transformer projection chains); at this limit Spark
      // falls back to per-operator codegen, which JITs fine.
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Port of the reference's exact-value unit tests
  * (reference: tests/test_feature_transformers.py:24-94; fixture
  * documented in /root/repo/FIXTURES.md §1.1). The 4-row OHLCV-ish panel:
  * 2 dates × 2 tickers, feature1 ∈ {10,20,30,40}, feature2 ∈ {1.0..4.0}.
  */
class TransformerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  def fixture: DataFrame = Seq(
    ("2021-01-01", "A", 10L, 1.0),
    ("2021-01-02", "A", 20L, 2.0),
    ("2021-01-01", "B", 30L, 3.0),
    ("2021-01-02", "B", 40L, 4.0)
  ).toDF("date", "ticker", "feature1", "feature2")

  def col1(df: DataFrame, c: String, ord: Seq[String]): Seq[Any] =
    df.orderBy(ord.map(col): _*).select(c).collect().map(_.get(0)).toSeq

  test("rank: normalized avg-tie rank per date (ranking.py:52-79)") {
    val out = RankTransformer(Seq("feature1", "feature2"), "date")
      .transform(fixture)
    assert(col1(out, "feature1_rank", Seq("date", "ticker")) ==
      Seq(0.5, 1.0, 0.5, 1.0))
    assert(col1(out, "feature2_rank", Seq("date", "ticker")) ==
      Seq(0.5, 1.0, 0.5, 1.0))
  }

  test("rank: average tie method (2-row tie → both 1.5/2)") {
    val df = Seq(("d1", 10), ("d1", 10), ("d1", 20))
      .toDF("date", "v")
    val out = RankTransformer(Seq("v"), "date").transform(df)
    val got = out.select("v_rank").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(0.5, 0.5, 1.0))
  }

  test("lag: leading nulls per ticker, lag-major descending order " +
    "(time_series.py:38-59)") {
    val t = LagTransformer(Seq("feature1"), Seq(1, 2), "ticker", Seq("date"))
    assert(t.outputNames == Seq("feature1_lag2", "feature1_lag1"))
    val out = t.transform(fixture)
    assert(col1(out, "feature1_lag1", Seq("ticker", "date")) ==
      Seq(null, 10L, null, 30L))
    assert(col1(out, "feature1_lag2", Seq("ticker", "date")) ==
      Seq(null, null, null, null))
  }

  test("moving average: min_samples = window (first w-1 rows null; " +
    "tests/test_feature_transformers.py:62-68)") {
    val out = MovingAverageTransformer(Seq("feature1"), Seq(2), "ticker",
      Seq("date")).transform(fixture)
    assert(col1(out, "feature1_ma2", Seq("ticker", "date")) ==
      Seq(null, 15.0, null, 35.0))
  }

  test("log return: ln diff, leading null per ticker " +
    "(tests/test_feature_transformers.py:71-83)") {
    val out = LogReturnTransformer(Seq("feature1"), "ticker", Seq("date"))
      .transform(fixture)
    val got = col1(out, "feature1_logreturn", Seq("ticker", "date"))
    assert(got(0) == null && got(2) == null)
    assert(math.abs(got(1).asInstanceOf[Double] -
      (math.log(20) - math.log(10))) < 1e-12)
    assert(math.abs(got(3).asInstanceOf[Double] -
      (math.log(40) - math.log(30))) < 1e-12)
  }

  test("groupstats: mean/range on the fixture (mean row0 = 5.5, range 9; " +
    "tests/test_feature_transformers.py:85-94)") {
    val out = GroupStatsTransformer(
      Map("g" -> Seq("feature1", "feature2")), Seq("mean", "range"))
      .transform(fixture)
    assert(col1(out, "g_groupstats_mean", Seq("date", "ticker")) ==
      Seq(5.5, 16.5, 11.0, 22.0))
    assert(col1(out, "g_groupstats_range", Seq("date", "ticker")) ==
      Seq(9.0, 27.0, 18.0, 36.0))
  }

  test("groupstats: std/skew/kurt/cv bias-corrected formulas " +
    "(narwhals_utils.py:31-162) on [1,2,3,4]") {
    val df = Seq((1.0, 2.0, 3.0, 4.0)).toDF("a", "b", "c", "d")
    val out = GroupStatsTransformer(Map("g" -> Seq("a", "b", "c", "d")))
      .transform(df).collect()(0)
    assert(math.abs(out.getAs[Double]("g_groupstats_mean") - 2.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("g_groupstats_std") -
      1.2909944487358056) < 1e-12)
    assert(math.abs(out.getAs[Double]("g_groupstats_skew")) < 1e-12)
    assert(math.abs(out.getAs[Double]("g_groupstats_kurt") - (-1.2)) < 1e-9)
    assert(math.abs(out.getAs[Double]("g_groupstats_cv") -
      0.5163977794943222) < 1e-12)
  }

  test("groupstats: NaN thresholds (std k<2, skew k<3, kurt k<4; " +
    "stats.py:97-104)") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val out = GroupStatsTransformer(Map("g" -> Seq("a", "b")),
      Seq("skew", "kurt")).transform(df).collect()(0)
    assert(out.getAs[Double]("g_groupstats_skew").isNaN)
    assert(out.getAs[Double]("g_groupstats_kurt").isNaN)
  }

  test("minmax scale: [0,1] bounds and degenerate-range → 0.5 " +
    "(base.py:17-23)") {
    val df = Seq(0.0, 5.0, 10.0).toDF("x")
    val out = MinMaxScaler(Seq("x")).transform(df)
    assert(col1(out, "x_scaled", Seq("x")) == Seq(0.0, 0.5, 1.0))
    val const = Seq(3.0, 3.0).toDF("x")
    val out2 = MinMaxScaler(Seq("x")).transform(const)
    assert(col1(out2, "x_scaled", Seq("x")) == Seq(0.5, 0.5))
  }

  test("gaussianizer: ordinal rank → (r-0.5)/n → Φ⁻¹ (base.py:10-14)") {
    val df = Seq(("e", 3.0, 1), ("e", 1.0, 2), ("e", 4.0, 3), ("e", 1.0, 4),
      ("e", 5.0, 5)).toDF("era", "v", "id")
    val out = Gaussianizer(Seq("v"), "era", Seq("id")).transform(df)
    val got = out.orderBy("id").select("v_gauss").collect()
      .map(_.getDouble(0)).toSeq
    // ordinal ranks (ties by id): [3,1,4,2,5] → p = [.5,.1,.7,.3,.9]
    val exp = Seq(0.0, -1.2815515655446008, 0.5244005127080407,
      -0.5244005127080407, 1.2815515655446008)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-8) }
  }

  test("inv_norm_cdf precision vs scipy-pinned values") {
    import graft.functions._
    val df = Seq(0.001, 0.025, 0.1, 0.5, 0.975, 0.999).toDF("p")
    val got = df.select(inv_norm_cdf(col("p")).as("x")).orderBy("p")
      .collect().map(_.getDouble(0))
    val exp = Seq(-3.090232306167813, -1.9599639845400545,
      -1.2815515655446008, 0.0, 1.9599639845400545, 3.090232306167813)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-8) }
  }

  test("pipeline: chained stages share one lazy plan and compose names") {
    val p = Pipeline(Seq(
      LogReturnTransformer(Seq("feature2"), "ticker", Seq("date")),
      RankTransformer(Seq("feature2_logreturn"), "date")))
    val out = p.transform(fixture)
    assert(out.columns.contains("feature2_logreturn_rank"))
    assert(out.count() == 4)
  }

  test("target encoder: leave-one-out means exclude the own row; " +
    "singleton categories fall back to the global mean; smoothing " +
    "shrinks toward it") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("cat", "y")
    val out = TargetEncoder(Seq("cat"), "y").transform(df)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("cat_te")).toMap
    assert(out(("a", 1.0)) == 2.5)   // (2+3)/2
    assert(out(("a", 3.0)) == 1.5)   // (1+2)/2
    assert(out(("b", 10.0)) == 4.0)  // singleton → global mean (16/4)
    val sm = TargetEncoder(Seq("cat"), "y", smoothing = 2.0).transform(df)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("cat_te")).toMap
    // smoothed LOO for ("a",1.0): (2.5*2 + 2*4) / (2+2) = 3.25
    assert(math.abs(sm(("a", 1.0)) - 3.25) < 1e-12)
  }

  test("robust scaler: median-centered, MAD-normalized; outlier barely " +
    "shifts the scale where it would wreck a z-score; constant group " +
    "yields null") {
    import spark.implicits._
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ (("g", 1000.0)))
      .toDF("grp", "v")
    val out = RobustScaler(Seq("v"), "grp").transform(df)
      .collect().map(r => r.getDouble(1) -> r.getAs[Double]("v_robust")).toMap
    // median of 1..9,1000 = 5.5; MAD = median(|v-5.5|) = 2.5 (unfazed
    // by the outlier); v=5.5-centered scale
    assert(math.abs(out(5.0) - (-0.5 / (1.4826 * 2.5))) < 1e-12)
    assert(out(1000.0) > 100, "outlier stays extreme under robust scale")
    val const = Seq(("c", 7.0), ("c", 7.0)).toDF("grp", "v")
    val c = RobustScaler(Seq("v"), "grp").transform(const).collect()
    assert(c.forall(_.isNullAt(2)), "zero MAD → null, not ±inf")
  }

  test("median_mad: fused aggregate agrees exactly with the two-pass " +
    "percentile formulation on real data, and is SQL-addressable") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
    val fused = li.groupBy("g")
      .agg(graft.functions.MedianMad(col("v")).as("mm"))
      .select(col("g"), element_at(col("mm"), 1).as("med"),
        element_at(col("mm"), 2).as("mad"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val meds = li.groupBy("g").agg(expr("percentile(v, 0.5)").as("med"))
    val twoPass = li.join(broadcast(meds), Seq("g"))
      .groupBy("g").agg(first(col("med")).as("med"),
        expr("percentile(abs(v - med), 0.5)").as("mad"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(fused.keySet == twoPass.keySet)
    fused.foreach { case (g, (med, mad)) =>
      assert(med == twoPass(g)._1, s"median mismatch for group $g")
      assert(mad == twoPass(g)._2, s"MAD mismatch for group $g")
    }
    // odd/even interpolation fixture: 1..4 → med 2.5, |x-2.5| sorted
    // = [0.5,0.5,1.5,1.5] → mad 1.0; empty-after-nulls group → null
    import spark.implicits._
    val tiny = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("n", Option.empty[Double])).toDF("g", "v")
    GraftFunctions.register(spark)
    tiny.createOrReplaceTempView("mm_tiny")
    val viaSql = spark.sql(
      "SELECT g, median_mad(v) AS mm FROM mm_tiny GROUP BY g")
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Double](1))).toMap
    assert(viaSql("a").contains(Seq(2.5, 1.0)))
    assert(viaSql("n").isEmpty, "all-null group yields null")
  }

  test("exact_percentiles: primitive-buffer aggregate agrees exactly " +
    "with Spark's percentile on real data, via Column and SQL") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
    val ps = Seq(0.05, 0.5, 0.9, 0.99)
    val ours = li.groupBy("g")
      .agg(graft.functions.ExactPercentiles(col("v"), ps).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val theirs = li.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(ours.keySet == theirs.keySet)
    ours.foreach { case (g, qs) =>
      assert(qs == theirs(g), s"percentile mismatch for group $g") }
    GraftFunctions.register(spark)
    li.createOrReplaceTempView("ep_vals")
    val viaSql = spark.sql(
      "SELECT g, exact_percentiles(v, array(0.5, 0.9)) AS q, " +
        "percentile(v, array(0.5, 0.9)) AS p FROM ep_vals GROUP BY g")
    assert(viaSql.where(col("q") =!= col("p")).count() == 0L)
  }

  test("winsorizer: clips at the group's interpolated quantiles and " +
    "leaves interior values untouched") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Winsorizer(Seq("v"), "grp", lo = 0.1, hi = 0.9).transform(df)
      .collect().map(r => r.getDouble(1) -> r.getAs[Double]("v_wins")).toMap
    // interpolated p10 of 1..10 = 1.9, p90 = 9.1
    assert(out(1.0) == 1.9 && out(10.0) == 9.1)
    assert(out(5.0) == 5.0 && out(9.0) == 9.0)
  }

  test("approx mode (winsorizer + robust scaler) tracks exact within " +
    "tolerance on a 20k-row skewed group") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // log-normal-ish values, two groups of very different size — the
    // shape where exact percentile's value-buffering is the hazard
    val df = (0 until 20000).map { i =>
      val g = if (i % 20 == 0) "small" else "big"
      (g, math.exp(rng.nextGaussian()) * 10.0)
    }.toDF("grp", "v").cache()
    def stats(d: org.apache.spark.sql.DataFrame, c: String) =
      d.agg(avg(col(c)), stddev(col(c))).collect()(0)
    val exact = Winsorizer(Seq("v"), "grp").transform(df)
    val apprx = Winsorizer(Seq("v"), "grp", approx = true).transform(df)
    // per-row comparison: clip bounds differ only by sketch error
    val joinedW = exact.select($"grp", $"v", $"v_wins".as("e"))
      .join(apprx.select($"grp", $"v", $"v_wins".as("a")), Seq("grp", "v"))
    val maxRel = joinedW.agg(max(abs($"e" - $"a") /
      greatest(abs($"e"), lit(1e-9)))).collect()(0).getDouble(0)
    assert(maxRel < 0.05, s"approx winsorize rel err $maxRel")
    val re = stats(RobustScaler(Seq("v"), "grp").transform(df), "v_robust")
    val ra = stats(RobustScaler(Seq("v"), "grp", approx = true)
      .transform(df), "v_robust")
    assert(math.abs(re.getDouble(0) - ra.getDouble(0)) < 0.05)
    assert(math.abs(re.getDouble(1) - ra.getDouble(1)) < 0.05)
    df.unpersist()
  }

  test("table profile: per-column rows, nulls, distincts, min/max/mean " +
    "in one pass over a frame with nulls") {
    import graft.operators.TableProfile
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 10.0)
    ).toDF("a", "b")
    val out = TableProfile.profile(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 4L &&
      a.getLong(2) == 1L && a.getLong(3) == 2L)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 2.0)
    assert(math.abs(a.getDouble(6) - 5.0 / 3) < 1e-6)
    val b = out(1)
    assert(b.getLong(2) == 1L && b.getLong(3) == 2L &&
      b.getDouble(4) == 10.0 && b.getDouble(5) == 30.0)
  }

  test("rolling corr/beta/cov: hand-computed full window, min-samples " +
    "nulls, zero-variance guard") {
    import graft.operators.RollingCorrTransformer
    val df = Seq(
      ("t", 1, 1.0, 1.0), ("t", 2, 2.0, 2.0), ("t", 3, 3.0, 3.0),
      ("t", 4, 4.0, 5.0),
      // u: constant y -> var(y)=0 -> corr and beta null, cov 0
      ("u", 1, 1.0, 7.0), ("u", 2, 2.0, 7.0), ("u", 3, 3.0, 7.0)
    ).toDF("tk", "i", "x", "y")
    val out = RollingCorrTransformer("x", "y", Seq(3), "tk", Seq("i"))
      .transform(df).orderBy("tk", "i").collect()
    def g(r: Int, c: String) =
      if (out(r).isNullAt(out(r).fieldIndex(c))) None
      else Some(out(r).getDouble(out(r).fieldIndex(c)))
    // rows 0,1: window not full
    assert(g(0, "x_y_corr3").isEmpty && g(1, "x_y_cov3").isEmpty)
    // t row 2: x=y over (1,2,3) -> corr 1, beta 1, cov 1
    assert(math.abs(g(2, "x_y_corr3").get - 1.0) < 1e-12)
    assert(math.abs(g(2, "x_y_beta3").get - 1.0) < 1e-12)
    assert(math.abs(g(2, "x_y_cov3").get - 1.0) < 1e-12)
    // t row 3: x=(2,3,4), y=(2,3,5): cov=1.5, var(y)=7/3, corr=1.5/sqrt(1*7/3)
    assert(math.abs(g(3, "x_y_cov3").get - 1.5) < 1e-12)
    assert(math.abs(g(3, "x_y_beta3").get - 1.5 / (7.0 / 3)) < 1e-12)
    assert(math.abs(g(3, "x_y_corr3").get
      - 1.5 / math.sqrt(7.0 / 3)) < 1e-12)
    // u row 6 (full window, constant y): guard nulls corr/beta, cov = 0
    assert(g(6, "x_y_corr3").isEmpty && g(6, "x_y_beta3").isEmpty)
    assert(math.abs(g(6, "x_y_cov3").get) < 1e-12)
  }

  test("purged k-fold: contiguous test blocks, embargoed neighbors " +
    "purged, everything else trains") {
    import graft.operators.PurgedKFold
    // 10 eras, k=3 -> blocks i0-3 / i4-6 / i7-9; embargo=1
    val eras = ('a' to 'j').map(c => Tuple1(c.toString)).toDF("era")
    val roles = PurgedKFold.eraRoles(eras, "era", k = 3, embargo = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(roles.size == 30, "every era x fold pair")
    assert(roles(("a", 0)) == "test" && roles(("d", 0)) == "test")
    assert(roles(("e", 0)) == "purged", "i4 is within 1 of block 0's end")
    assert(roles(("f", 0)) == "train" && roles(("j", 0)) == "train")
    assert(roles(("d", 1)) == "purged" && roles(("h", 1)) == "purged")
    assert(roles(("e", 1)) == "test" && roles(("a", 1)) == "train")
    assert(roles(("g", 2)) == "purged" && roles(("j", 2)) == "test")
    // per fold: test+purged+train partition the eras
    (0 until 3).foreach { f =>
      val counts = ('a' to 'j')
        .groupBy(c => roles((c.toString, f))).view.mapValues(_.size).toMap
      assert(counts.values.sum == 10)
      assert(counts("test") >= 3 && counts("train") >= 3)
    }
  }

  test("quality gate: bounds logic, null-metric failure, one row per " +
    "check from one pass") {
    import graft.operators.QualityGate, QualityGate._
    val df = Seq[(java.lang.Double, String)](
      (1.0, "x"), (5.0, "y"), (null, "x")).toDF("v", "s")
    val out = QualityGate.evaluate(df,
      Seq(minRows(2), maxNullFrac("v", 0.5)) ++
        valueRange("v", 0.0, 4.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(4))).toMap
    assert(out("min_rows") == ((3.0, true)))
    assert(math.abs(out("null_frac_v")._1 - 1.0 / 3) < 1e-9 &&
      out("null_frac_v")._2, "1/3 nulls is under the 0.5 ceiling")
    assert(out("min_v") == ((1.0, true)))
    assert(out("max_v") == ((5.0, false)), "5.0 breaches hi=4.0")
    // a null observed value fails any bounded check
    assert(!out.keys.isEmpty && {
      val row = QualityGate.evaluate(df, Seq(Check("all_null",
        min(when(lit(false), col("v"))).cast("double"), lo = Some(0.0))))
        .head()
      row.isNullAt(1) && !row.getBoolean(4)
    })
  }

  test("ewma: hand-computed pandas ewm(adjust=True) values, expanding " +
    "head normalization, per-ticker isolation") {
    import graft.operators.EwmaTransformer
    // span=3 -> alpha=0.5; x = 1,2,4:
    // t0: 1; t1: (2+0.5*1)/1.5 = 5/3; t2: (4+0.5*2+0.25*1)/1.75 = 3
    val df = Seq(("t", 1, 1.0), ("t", 2, 2.0), ("t", 3, 4.0),
      ("u", 1, 100.0)).toDF("tk", "i", "x")
    val out = EwmaTransformer(Seq("x"), span = 3.0, lookback = 3,
      "tk", Seq("i")).transform(df)
      .orderBy("tk", "i").collect()
      .map(_.getAs[Double]("x_ewma"))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) - 5.0 / 3) < 1e-12)
    assert(math.abs(out(2) - 3.0) < 1e-12)
    assert(out(3) == 100.0, "other ticker's history must not leak")
  }

  test("resample: daily grid per key, gap days forward-filled and " +
    "flagged, same-day observations averaged") {
    import graft.operators.Resample
    val df = Seq(
      ("a", "2021-01-01 10:00:00", 10.0),
      ("a", "2021-01-01 15:00:00", 20.0), // same day -> mean 15
      ("a", "2021-01-02 09:00:00", 30.0),
      ("a", "2021-01-04 09:00:00", 40.0), // day 3 is a gap
      ("b", "2021-03-01 00:00:00", 7.0)   // single-day key
    ).toDF("k", "ts", "v")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Resample.dailyFfill(df, "k", "ts", "v")
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("a", "2021-01-01", 15.0, false),
      ("a", "2021-01-02", 30.0, false),
      ("a", "2021-01-03", 30.0, true),
      ("a", "2021-01-04", 40.0, false),
      ("b", "2021-03-01", 7.0, false)))
  }

  test("zorder: pinned Morton interleave, clamp + degenerate-column " +
    "quantization") {
    import graft.operators.ZOrder
    // q0=3 (011), q1=5 (101) at 3 bits -> bit b of dim d lands at 2b+d:
    // 1 + 2 + 4 + 32 = 39
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 3).as("z"))
      .head().getLong(0)
    assert(z == 39L)
    // quantize: full range maps ends to 0/levels; constant column -> 0
    val df = Seq((0.0, 7.0), (10.0, 7.0), (5.0, 7.0)).toDF("x", "c")
    val q = ZOrder.withZ(df, Seq("x", "c"), bits = 8)
      .select(col("x"), col("z")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // c is constant -> contributes 0 bits, z = spread(q(x)) over even bits
    def spread(v: Long): Long =
      (0 until 8).map(b => ((v >> b) & 1L) << (2 * b)).sum
    assert(q(0.0) == spread(0L))
    assert(q(10.0) == spread(255L))
    assert(q(5.0) == spread(127L)) // floor(0.5*255) = 127
    // bits*dims > 63 would overflow into the sign bit: rejected up front
    val cols8 = (0 until 8).map(i => col("x") + lit(i))
    intercept[IllegalArgumentException] {
      ZOrder.interleave(cols8, 8) // 64 bits
    }
  }

  test("zorder layout: rows in one bucket are close in EVERY clustered " +
    "dimension, and partitions are sorted by z") {
    import graft.operators.ZOrder
    // a 64x64 grid of points: global quantized spread is 255 per dim;
    // any 16-way z-bucket (top 4 Morton bits = top 2 bits of each dim)
    // confines each dim to a quarter of its range
    val grid = (for { i <- 0 until 64; j <- 0 until 64 }
      yield (i.toDouble, j.toDouble)).toDF("x", "y")
    val bucketed = ZOrder.withZ(grid, Seq("x", "y"), bits = 8)
      .withColumn("bucket", shiftrightunsigned(col("z"), 12))
    val spreads = bucketed.groupBy("bucket")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spreads.length == 16)
    assert(spreads.forall(r => r.getDouble(1) <= 16.0 &&
      r.getDouble(2) <= 16.0),
      "a z-bucket must confine both dimensions to ~1/4 of their range")
    // layout: z monotone within every partition (stats-pruned write shape)
    val parts = ZOrder.layout(grid, Seq("x", "y"), bits = 8,
      numPartitions = 4)
      .select("z").rdd.mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator(zs.isEmpty || zs.sliding(2).forall(w =>
          w.size < 2 || w(0) <= w(1)))
      }.collect()
    assert(parts.forall(identity))
  }

  test("quantile binner: equal-frequency quartiles per group, right-" +
    "closed bins, nulls bin null, constant group collapses to bin 1") {
    import org.apache.spark.sql.types._
    val rows = (1 to 8).map(i => (i.toLong, "a", Some(i.toDouble))) ++
      Seq((9L, "a", None), (10L, "c", Some(7.0)), (11L, "c", Some(7.0)),
        (12L, "c", Some(7.0)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, g, v) =>
        org.apache.spark.sql.Row(id, g, v.orNull) }),
      StructType(Seq(StructField("id", LongType), StructField("g", StringType),
        StructField("x", DoubleType))))
    val out = QuantileBinner("x", k = 4, Seq("g"))
      .transform(df)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    // group a: values 1..8; interpolated quartile cuts 2.75 / 4.5 / 6.25
    // → bins (1,2)=1, (3,4)=2, (5,6)=3, (7,8)=4; bin i covers (q_{i-1}, q_i]
    assert((1 to 8).forall(i => out(i.toLong) == (i + 1) / 2),
      s"$out")
    assert(out(9L) == -1, "null value must bin null")
    // constant group: every cut equals the value; strict > puts all in 1
    assert(Seq(10L, 11L, 12L).forall(out(_) == 1))
  }
}
