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
  * FITTED estimator stages ([[ModelStage]] around any
  * `graft.ml.ModelEstimator`) embed their whole WeightsIO family
  * payload inside this same artifact — meta keys under `s{i}.m.`,
  * weight sections under `s{i}.` — so the reference's
  * whole-fitted-pipeline pickle (transform chain + trained final
  * regressor as ONE object, README.md:117-162,
  * tests/test_model_estimators.py:545-576) is one file here too; load
  * dispatches the payload through `graft.ml.ModelCodecs` and the
  * rebuilt estimator scores bit-identically (PipelineIOSpec). The
  * function-carrying transformers (EmbeddingTransformer, RowPredictor)
  * persist by their registered transport NAME
  * (`graft.ml.Transports`) and re-wire the function at load; instances
  * built around a bare lambda are rejected at save with a pointer to
  * the registry. Any other stage kind without a codec is rejected
  * rather than silently dropped. */
object PipelineIO {

  def save(path: String, pipeline: Pipeline): Unit = {
    val flat = flatten(pipeline.stages)
    val meta = Map.newBuilder[String, String]
    val secs = Seq.newBuilder[(String, Array[Double])]
    meta += "family" -> "pipeline"
    meta += "n" -> flat.size.toString
    flat.zipWithIndex.foreach { case (s, i) =>
      encode(s, s"s$i.", meta, secs)
    }
    WeightsIO.save(path, meta.result(), secs.result())
  }

  def load(path: String): Pipeline = {
    val (meta, sections) = WeightsIO.load(path)
    WeightsIO.requireFamily(meta, "pipeline", path)
    Pipeline((0 until metaReq(meta, "n", path).toInt).map(i =>
      decode(meta, sections, s"s$i.", path)))
  }

  /** Meta lookup with the loader-error convention: a truncated or
    * hand-edited artifact fails with the artifact path and the missing
    * key, not a bare NoSuchElementException. */
  private def metaReq(meta: Map[String, String], key: String,
      path: String): String =
    meta.getOrElse(key, throw new IllegalArgumentException(
      s"pipeline artifact at $path is missing meta key `$key` — " +
        "truncated or hand-edited artifact?"))

  private def flatten(stages: Seq[GraftTransformer]): Seq[GraftTransformer] =
    stages.flatMap {
      case Pipeline(inner) => flatten(inner)
      case s => Seq(s)
    }

  private type MetaB = scala.collection.mutable.Builder[(String, String),
    Map[String, String]]
  private type SecB = scala.collection.mutable.Builder[
    (String, Array[Double]), Seq[(String, Array[Double])]]

  private def encode(s: GraftTransformer, p: String, m: MetaB,
      secs: SecB): Unit = {
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
      case ModelStage(model) =>
        // embed the family payload: meta under `{p}m.`, sections under
        // `{p}` — the SAME (meta, sections) the standalone family
        // artifact holds, so the two persistence surfaces stay one codec
        str("kind", "model")
        val (mm, ss) = model.saveParts
        mm.foreach { case (k, v) => m += (p + "m." + k) -> v }
        ss.foreach { case (n, a) => secs += (p + n) -> a }
      case e: graft.ml.EmbeddingTransformer =>
        e.transportName match {
          case Some(tn) =>
            str("kind", "embed"); str("transport", tn)
            str("textCol", e.textCol)
            str("batchSize", e.batchSize.toString)
            str("dim", e.dim.toString)
            str("template", e.template.getOrElse(""))
            str("hasTemplate", e.template.isDefined.toString)
          case None => throw new IllegalArgumentException(
            "EmbeddingTransformer built around a bare function cannot " +
              "persist — register the transport " +
              "(graft.ml.Transports.registerEmbedder) and construct " +
              "via EmbeddingTransformer.named so the artifact can " +
              "carry its name")
        }
      case r: graft.ml.RowPredictor =>
        r.transportName match {
          case Some(tn) =>
            str("kind", "row_predict"); str("transport", tn)
            names("inputCols", r.inputCols)
            names("outputFields", r.outputFields)
            str("batchSize", r.batchSize.toString)
            str("concurrency", r.concurrency.toString)
          case None => throw new IllegalArgumentException(
            "RowPredictor built around a bare function cannot persist " +
              "— register the transport " +
              "(graft.ml.Transports.registerPredictor) and construct " +
              "via RowPredictor.named so the artifact can carry its " +
              "name")
        }
      case other => throw new IllegalArgumentException(
        s"no pipeline codec for stage ${other.getClass.getName}")
    }
  }

  private def decode(meta: Map[String, String],
      sections: Map[String, Array[Double]], p: String, path: String)
      : GraftTransformer = {
    def str(k: String): String = metaReq(meta, p + k, path)
    def names(k: String): Seq[String] = WeightsIO.namesFromMeta(str(k))
    def ints(k: String): Seq[Int] = WeightsIO.intsFromMeta(str(k))
    def doubles(k: String): Seq[Double] = WeightsIO.doublesFromMeta(str(k))
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
      case "model" =>
        // slice the stage's embedded payload back out of the flat
        // namespaces (`s12.` never prefix-collides with `s1.` — the
        // dot terminates the stage index) and hand it to the family
        // registry; errors name the artifact AND the stage
        val mp = p + "m."
        val sub = meta.collect {
          case (k, v) if k.startsWith(mp) => k.substring(mp.length) -> v
        }
        val subSecs = sections.collect {
          case (k, v) if k.startsWith(p) => k.substring(p.length) -> v
        }
        ModelStage(graft.ml.ModelCodecs.load(sub, subSecs,
          s"$path (stage ${p.stripSuffix(".")})"))
      case "embed" =>
        graft.ml.EmbeddingTransformer.named(str("transport"),
          str("textCol"), str("dim").toInt, str("batchSize").toInt,
          if (str("hasTemplate").toBoolean) Some(str("template"))
          else None)
      case "row_predict" =>
        graft.ml.RowPredictor.named(str("transport"), names("inputCols"),
          names("outputFields"), str("batchSize").toInt,
          str("concurrency").toInt)
      case k => throw new IllegalArgumentException(
        s"unknown pipeline stage kind: $k")
    }
  }
}
