package graft.operators

import graft.ml.WeightsIO

/** Pipeline persistence — the sklearn analog persists the whole fitted
  * `make_pipeline(...)` object, not one estimator (reference
  * README.md:117-162), so a composed feature chain travels from the
  * job that defined it to every scoring job as one artifact.
  *
  * The feature-transformer stages are configuration-complete (their
  * statistics — window frames, per-era ranks, global min/max — are
  * recomputed inside `transform`, the narwhals fit-on-transform
  * semantics the reference's transformers share), so the artifact is
  * the stage list with every constructor parameter, stored in the SAME
  * exact-double JSON container as the estimator families (WeightsIO;
  * one meta namespace per stage). `load` rebuilds the identical case
  * classes — `transform` on the loaded pipeline is the identical
  * Catalyst plan, hence bit-identical output (PipelineIOSpec).
  *
  * Nested [[Pipeline]] stages are flattened on save: sequential
  * composition is associative (`Pipeline(a, Pipeline(b, c))` folds the
  * same frame chain as `Pipeline(a, b, c)`), so flattening preserves
  * both `transform` and `outputNames`.
  *
  * Estimator stages (fitted weights) persist through their own family
  * codecs (`MLPRegressor.save`, `LSTMTrainer.save`, … — WeightsIOSpec /
  * ModelPersistenceSpec); a GraftTransformer wrapper around one of
  * those belongs in that artifact, not here — `save` rejects stage
  * kinds it has no codec for rather than silently dropping them. */
object PipelineIO {

  def save(path: String, pipeline: Pipeline): Unit = {
    val flat = flatten(pipeline.stages)
    val meta = Map.newBuilder[String, String]
    meta += "family" -> "pipeline"
    meta += "n" -> flat.size.toString
    flat.zipWithIndex.foreach { case (s, i) => encode(s, s"s$i.", meta) }
    WeightsIO.save(path, meta.result(), Seq.empty)
  }

  def load(path: String): Pipeline = {
    val (meta, _) = WeightsIO.load(path)
    WeightsIO.requireFamily(meta, "pipeline", path)
    Pipeline((0 until meta("n").toInt).map(i => decode(meta, s"s$i.")))
  }

  private def flatten(stages: Seq[GraftTransformer]): Seq[GraftTransformer] =
    stages.flatMap {
      case Pipeline(inner) => flatten(inner)
      case s => Seq(s)
    }

  private type MetaB = scala.collection.mutable.Builder[(String, String),
    Map[String, String]]

  private def encode(s: GraftTransformer, p: String, m: MetaB): Unit = {
    def names(k: String, v: Seq[String]): Unit =
      m += (p + k) -> WeightsIO.namesToMeta(v)
    def ints(k: String, v: Seq[Int]): Unit =
      m += (p + k) -> v.mkString(",")
    def str(k: String, v: String): Unit = m += (p + k) -> v
    s match {
      case RankTransformer(f, d) =>
        str("kind", "rank"); names("features", f); str("dateCol", d)
      case LagTransformer(f, w, t, o) =>
        str("kind", "lag"); names("features", f); ints("windows", w)
        str("tickerCol", t); names("orderCols", o)
      case MovingAverageTransformer(f, w, t, o) =>
        str("kind", "ma"); names("features", f); ints("windows", w)
        str("tickerCol", t); names("orderCols", o)
      case RollingStatsTransformer(f, w, t, o, st) =>
        str("kind", "rolling"); names("features", f); ints("windows", w)
        str("tickerCol", t); names("orderCols", o); names("stats", st)
      case LogReturnTransformer(f, t, o) =>
        str("kind", "logreturn"); names("features", f)
        str("tickerCol", t); names("orderCols", o)
      case RollingCorrTransformer(x, y, w, t, o) =>
        str("kind", "rollcorr"); str("xCol", x); str("yCol", y)
        ints("windows", w); str("tickerCol", t); names("orderCols", o)
      case EwmaTransformer(f, sp, lb, t, o) =>
        str("kind", "ewma"); names("features", f)
        str("span", sp.toString); str("lookback", lb.toString)
        str("tickerCol", t); names("orderCols", o)
      case GroupStatsTransformer(mapping, stats) =>
        str("kind", "groupstats"); names("stats", stats)
        // keys in the ORIGINAL map's iteration order: outputNames
        // derives column order from mapping.toSeq, and decode rebuilds
        // a ListMap in this order — so the loaded transformer emits
        // columns in the same order the saved one did, at any map size
        val keys = mapping.toSeq.map(_._1)
        names("groups", keys)
        keys.zipWithIndex.foreach { case (k, i) =>
          names(s"group$i", mapping(k))
        }
      case MinMaxScaler(f, sfx) =>
        str("kind", "minmax"); names("features", f); str("suffix", sfx)
      case StandardScaler(f, sfx) =>
        str("kind", "standardize"); names("features", f)
        str("suffix", sfx)
      case Gaussianizer(f, era, tie, sfx) =>
        str("kind", "gaussianize"); names("features", f)
        str("eraCol", era); names("tiebreakCols", tie); str("suffix", sfx)
      case TargetEncoder(cats, tgt, smoothing, sfx) =>
        str("kind", "target_encode"); names("cats", cats)
        str("targetCol", tgt); str("smoothing", smoothing.toString)
        str("suffix", sfx.getOrElse(""))
        str("hasSuffix", sfx.isDefined.toString)
      case RobustScaler(f, g, approx, acc) =>
        str("kind", "robust"); names("features", f); str("groupCol", g)
        str("approx", approx.toString); str("accuracy", acc.toString)
      case Winsorizer(f, g, lo, hi, approx, acc) =>
        str("kind", "winsorize"); names("features", f); str("groupCol", g)
        str("lo", lo.toString); str("hi", hi.toString)
        str("approx", approx.toString); str("accuracy", acc.toString)
      case QuantileBinner(v, kk, g, o) =>
        str("kind", "qbin"); str("valueCol", v); str("k", kk.toString)
        names("groupCols", g); str("out", o)
      case graft.solvers.FeatureNeutralizer(p, f, props, era, id, sfx) =>
        str("kind", "neutralize"); names("preds", p); names("features", f)
        str("proportions", props.mkString(","))
        str("eraCol", era); str("idCol", id)
        str("suffix", sfx.getOrElse(""))
        str("hasSuffix", sfx.isDefined.toString)
      case graft.solvers.FeaturePenalizer(p, f, exps, era, id, sfx, lr,
          iters, tol) =>
        str("kind", "penalize"); names("preds", p); names("features", f)
        str("maxExposures", exps.mkString(","))
        str("eraCol", era); str("idCol", id)
        str("suffix", sfx.getOrElse(""))
        str("hasSuffix", sfx.isDefined.toString)
        str("lr", lr.toString); str("maxIters", iters.toString)
        str("tol", tol.toString)
      case graft.text.TextStatsTransformer(t, pfx) =>
        str("kind", "text_stats"); str("textCol", t); str("prefix", pfx)
      case graft.text.LangIdTransformer(t, o) =>
        str("kind", "lang_id"); str("textCol", t); str("out", o)
      case graft.text.QualityFilterTransformer(t, pfx, minW, maxW, minL,
          maxL, minTtr, maxTop) =>
        str("kind", "quality_filter"); str("textCol", t)
        str("prefix", pfx); str("minWords", minW.toString)
        str("maxWords", maxW.toString)
        str("minMeanWordLen", minL.toString)
        str("maxMeanWordLen", maxL.toString)
        str("minTypeTokenRatio", minTtr.toString)
        str("maxTopWordFrac", maxTop.toString)
      case graft.text.RepetitionTransformer(t, pfx) =>
        str("kind", "repetition"); str("textCol", t); str("prefix", pfx)
      case graft.ml.DimReducer(f, n) =>
        str("kind", "pca"); names("features", f); str("n", n.toString)
      case other => throw new IllegalArgumentException(
        s"no pipeline codec for stage ${other.getClass.getName} — " +
          "persist estimator stages through their family save()")
    }
  }

  private def decode(meta: Map[String, String], p: String)
      : GraftTransformer = {
    def names(k: String): Seq[String] = WeightsIO.namesFromMeta(meta(p + k))
    def ints(k: String): Seq[Int] = WeightsIO.intsFromMeta(meta(p + k))
    def doubles(k: String): Seq[Double] =
      WeightsIO.doublesFromMeta(meta(p + k))
    def str(k: String): String = meta(p + k)
    str("kind") match {
      case "rank" => RankTransformer(names("features"), str("dateCol"))
      case "lag" => LagTransformer(names("features"), ints("windows"),
        str("tickerCol"), names("orderCols"))
      case "ma" => MovingAverageTransformer(names("features"),
        ints("windows"), str("tickerCol"), names("orderCols"))
      case "rolling" => RollingStatsTransformer(names("features"),
        ints("windows"), str("tickerCol"), names("orderCols"),
        names("stats"))
      case "logreturn" => LogReturnTransformer(names("features"),
        str("tickerCol"), names("orderCols"))
      case "rollcorr" => RollingCorrTransformer(str("xCol"), str("yCol"),
        ints("windows"), str("tickerCol"), names("orderCols"))
      case "ewma" => EwmaTransformer(names("features"),
        str("span").toDouble, str("lookback").toInt, str("tickerCol"),
        names("orderCols"))
      case "groupstats" =>
        val keys = names("groups")
        // ListMap preserves the saved key order at ANY size (a plain
        // immutable Map only does so up to 4 entries) — outputNames and
        // the emitted column order derive from mapping.toSeq
        GroupStatsTransformer(
          scala.collection.immutable.ListMap(
            keys.zipWithIndex.map { case (k, i) =>
              k -> names(s"group$i")
            }: _*), names("stats"))
      case "minmax" => MinMaxScaler(names("features"), str("suffix"))
      case "standardize" => StandardScaler(names("features"),
        str("suffix"))
      case "gaussianize" => Gaussianizer(names("features"), str("eraCol"),
        names("tiebreakCols"), str("suffix"))
      case "target_encode" => TargetEncoder(names("cats"),
        str("targetCol"), str("smoothing").toDouble,
        if (str("hasSuffix").toBoolean) Some(str("suffix")) else None)
      case "robust" => RobustScaler(names("features"), str("groupCol"),
        str("approx").toBoolean, str("accuracy").toInt)
      case "winsorize" => Winsorizer(names("features"), str("groupCol"),
        str("lo").toDouble, str("hi").toDouble,
        str("approx").toBoolean, str("accuracy").toInt)
      case "qbin" => QuantileBinner(str("valueCol"), str("k").toInt,
        names("groupCols"), str("out"))
      case "neutralize" => graft.solvers.FeatureNeutralizer(
        names("preds"), names("features"),
        doubles("proportions"), str("eraCol"), str("idCol"),
        if (str("hasSuffix").toBoolean) Some(str("suffix")) else None)
      case "penalize" => graft.solvers.FeaturePenalizer(
        names("preds"), names("features"),
        doubles("maxExposures"), str("eraCol"), str("idCol"),
        if (str("hasSuffix").toBoolean) Some(str("suffix")) else None,
        str("lr").toDouble, str("maxIters").toInt, str("tol").toDouble)
      case "text_stats" =>
        graft.text.TextStatsTransformer(str("textCol"), str("prefix"))
      case "lang_id" =>
        graft.text.LangIdTransformer(str("textCol"), str("out"))
      case "quality_filter" => graft.text.QualityFilterTransformer(
        str("textCol"), str("prefix"), str("minWords").toInt,
        str("maxWords").toInt, str("minMeanWordLen").toDouble,
        str("maxMeanWordLen").toDouble,
        str("minTypeTokenRatio").toDouble,
        str("maxTopWordFrac").toDouble)
      case "repetition" =>
        graft.text.RepetitionTransformer(str("textCol"), str("prefix"))
      case "pca" => graft.ml.DimReducer(names("features"), str("n").toInt)
      case k => throw new IllegalArgumentException(
        s"unknown pipeline stage kind: $k")
    }
  }
}
