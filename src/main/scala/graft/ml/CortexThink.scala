package graft.ml

import scala.util.control.NonFatal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The self-improving think-loop of the reference's KerasCortex
  * (keras_cortex.py:99-146) with the LLM's "propose a new `build_model`
  * source" step re-expressed as a pluggable PROPOSAL TRANSPORT over a
  * constrained model-spec DSL.
  *
  * The reference loop: fit a baseline, score it on validation, then for
  * n iterations ask an LLM (dspy ChainOfThought over the
  * KerasCodeRefinements signature, keras_cortex.py:44-77) for a modified
  * `build_model` body, `exec` it, refit, rescore, append (code, metric)
  * to the performance log, and keep the best model by strict metric
  * improvement; ANY failure in an iteration breaks the loop and keeps
  * the best so far (keras_cortex.py:115-143).
  *
  * Arbitrary code-gen + `exec` is a Python-ecosystem feature with no
  * JVM analog that isn't a security hole, so the suggestion language
  * here is a closed spec grammar (`"mlp hidden=64 lr=0.05 epochs=100"`,
  * `"ridge feature=l_tax lambda=100.0"`) interpreted by a
  * [[SpecInterpreter]] — the same expressive surface the reference's
  * prompt constrains its LLM to ("modified build_model method body", a
  * Keras layer stack), minus string-level syntax. A spec that fails to
  * parse plays the role of code that fails to `exec`: the loop breaks.
  *
  * The proposer is the SAME seam shape as the reference's `Think`
  * module: (current spec, performance log, optimization goal) → new
  * spec. Tests use deterministic schedules; [[CortexThink.httpProposer]]
  * is the production client (an LLM endpoint behind a JSON POST),
  * sharing [[HttpTransport.JsonPoster]]'s retry/backoff policy.
  *
  * Scale shape: the loop itself is driver-side orchestration — each
  * trial is a distributed fit plus a distributed scalar validation
  * metric (2 jobs); nothing corpus-sized ever reaches the driver. The
  * proposer is called once per iteration (driver-side, n ≤ ~10), never
  * per row.
  */
object CortexThink {

  /** (current spec, performance log [(spec, metric)…], goal) → new spec —
    * the `Think.forward` signature (keras_cortex.py:60-77). */
  type Proposer = (String, Seq[(String, Double)], String) => String

  /** Pluggable "compile + fit + score" backend for one spec grammar.
    * `fit` returning None is the analog of `exec` raising: the spec does
    * not compile, and the think-loop breaks keeping the best so far. */
  trait SpecInterpreter[M] {
    def fit(train: DataFrame, spec: String): Option[M]

    /** Validation metric, HIGHER is better (the reference scores R²). */
    def score(model: M, valid: DataFrame): Double
  }

  /** One trial's record: 0-based iteration (0 = the baseline fit),
    * the spec that ran, its validation metric, and whether the loop's
    * best-so-far pointer moved to it (strict `>`, first-wins on ties —
    * keras_cortex.py:131-135). */
  case class Trial(iter: Int, spec: String, metric: Double,
      accepted: Boolean)

  /** `completedIterations` counts propose→fit→score rounds that ran to
    * completion (the baseline fit is not an iteration); when the loop
    * broke early, `failureReason` says why — so a broken loop is
    * distinguishable from a completed one (the reference at least
    * prints the exception, keras_cortex.py:139-141) without inferring
    * it from `log.size`. */
  case class Result[M](best: M, bestSpec: String, bestMetric: Double,
      log: Seq[Trial], completedIterations: Int = 0,
      failureReason: Option[String] = None)

  /** Run the think-loop: baseline fit + score, then up to `nIterations`
    * propose → fit → score rounds, keeping the best model by strict
    * validation improvement. Mirrors the reference's control flow
    * exactly: the log records every trial that SCORED (a failed
    * iteration appends nothing and ends the loop). */
  def thinkLoop[M](train0: DataFrame, valid0: DataFrame, baseSpec: String,
      interp: SpecInterpreter[M], propose: Proposer, nIterations: Int = 5,
      goal: String = "improve validation metrics (R2)"): Result[M] = {
    // every trial re-reads BOTH frames (fit collects train, score
    // scans valid); materialize them once so the loop's 1+nIterations
    // rounds don't each re-run the upstream scan+filter lineage
    // (measured ~1/3 of the loop's wall at the gate scale). Values
    // unchanged — checkpointing only truncates lineage.
    // size bound (CheckpointPolicy): BOUNDED — fit() collects train to
    // the driver, so callers pass driver-sized frames by contract;
    // both checkpoints hold at most that sample.
    val train = train0.localCheckpoint()
    val valid = valid0.localCheckpoint()
    val baseline = interp.fit(train, baseSpec).getOrElse(
      throw new IllegalArgumentException(
        s"base spec does not compile: $baseSpec"))
    var bestMetric = interp.score(baseline, valid)
    var best = baseline
    var bestSpec = baseSpec
    var suggestion = baseSpec
    val log = scala.collection.mutable.ArrayBuffer(
      Trial(0, baseSpec, bestMetric, accepted = true))
    var i = 0
    var completed = 0
    var failure: Option[String] = None
    while (i < nIterations && failure.isEmpty) {
      try {
        suggestion = propose(suggestion,
          log.toSeq.map(t => (t.spec, t.metric)), goal)
        interp.fit(train, suggestion) match {
          case None => // "exec" failed → break, keep best
            failure = Some(s"iteration ${i + 1}: spec does not " +
              s"compile: $suggestion")
          case Some(m) =>
            val metric = interp.score(m, valid)
            val improved = metric > bestMetric
            log += Trial(i + 1, suggestion, metric, improved)
            if (improved) {
              bestMetric = metric; best = m; bestSpec = suggestion
            }
            completed += 1
        }
      } catch {
        case NonFatal(e) => failure = Some(s"iteration ${i + 1}: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      i += 1
    }
    Result(best, bestSpec, bestMetric, log.toSeq, completed, failure)
  }

  /** Production proposer: JSON POST to an LLM endpoint, mirroring the
    * KerasCodeRefinements field contract (keras_cortex.py:44-56):
    *   POST {"current_code": s, "performance_log": [[spec, metric]…],
    *         "goal": s}                     → {"suggestion": s}
    * Retry/backoff/4xx-fail-fast policy is [[HttpTransport.JsonPoster]]'s. */
  def httpProposer(endpoint: String, timeoutMs: Long = 30000,
      maxRetries: Int = 3, backoffMs: Long = 50): Proposer = {
    val poster = new HttpTransport.JsonPoster(endpoint, timeoutMs,
      maxRetries, backoffMs)
    (current: String, perfLog: Seq[(String, Double)], goal: String) => {
      val root = poster.obj()
      root.put("current_code", current)
      val arr = root.putArray("performance_log")
      perfLog.foreach { case (s, m) =>
        val e = arr.addArray(); e.add(s); e.add(m)
      }
      root.put("goal", goal)
      val sug = poster.post(root.toString).get("suggestion")
      require(sug != null && sug.isTextual,
        "proposer endpoint returned no 'suggestion' string")
      sug.asText()
    }
  }
}

/** `"mlp hidden=<int> lr=<double> epochs=<int>"` → a distributed
  * [[MLPRegressor]] fit scored by validation R² — the reference's
  * default base estimator (keras_cortex.py:92-94: MLPRegressor, scored
  * by `.score` = R²). The wiring the spec does NOT control
  * (`batchFraction`, `optimizer`, …) is interpreter construction —
  * exactly the role the reference's surrounding `build_model` plays
  * around the LLM-controlled body. `batchFraction = 1.0` makes every
  * trial a deterministic full-batch trajectory, which is what lets the
  * MLP think-loop run under a FULL value oracle (q_cortex_mlp: the
  * whole Adam trajectory of every trial unrolls into SQL). */
class MlpSpecInterpreter(featureCols: Seq[String], targetCol: String,
    batchFraction: Double = 0.2, optimizer: String = "adam",
    scaleTarget: Boolean = true, seed: Long = 42L)
    extends CortexThink.SpecInterpreter[MLPRegressor] with Serializable {
  private val pat =
    """^mlp hidden=(\d+) lr=(\d+(?:\.\d+)?) epochs=(\d+)$""".r

  def fit(train: DataFrame, spec: String): Option[MLPRegressor] =
    spec match {
      case pat(h, lr, ep) => Some(new MLPRegressor(featureCols, targetCol,
        hidden = h.toInt, lr = lr.toDouble, epochs = ep.toInt,
        seed = seed, scaleTarget = scaleTarget,
        batchFraction = batchFraction, optimizer = optimizer).fit(train))
      case _ => None
    }

  def score(model: MLPRegressor, valid: DataFrame): Double =
    Metrics.r2(model.predict(valid), "prediction", targetCol, Seq.empty)
      .collect()(0).getDouble(0)
}

/** The WIDENED model-spec grammar (VERDICT r11 item 3) — closer to the
  * reference's proposal space, where the LLM rewrites an arbitrary
  * `build_model` body varying depth, units, dropout and loss
  * (keras_cortex.py:96-143). Specs are a family token plus key=value
  * knobs in any order, each mapping to an ALREADY-TRAINED surface:
  *
  *   - `mlp hidden=<int>`          → shallow [[MLPRegressor]]
  *   - `mlp layers=<i,j,..>`       → [[DeepMLPRegressor]] (depth knob;
  *     optional `dropout=<d>` / `activation=relu|swish`)
  *   - `forest trees=<int> depth=<int> [trunk=<i,j>]`
  *                                 → [[SoftNdfRegressor]]
  *   - `bottleneck latent=<int>`   → [[BottleneckEncoder]] (closed-form
  *     PCA + lstsq head — the only family with no lr/epochs knobs)
  *   - `lr=<double> epochs=<int>`  → required optimizer knobs
  *     (iterative families)
  *   - `loss=mse|spearman|combined`→ training objective
  *
  * Dispatch returns the common [[ModelEstimator]] surface, so one
  * think-loop explores shallow, deep, forest and encoder architectures
  * in the same run — the reference's LLM freely moves between
  * `build_model` bodies the same way (its sequence siblings live in
  * [[SeqSpecInterpreter]]). A malformed spec, an unknown knob, or a
  * knob the dispatched family lacks (dropout on the shallow path)
  * returns None — the `exec`-failure analog; the loop breaks and keeps
  * the best (CortexThinkSpec pins accept/reject/dispatch).
  *
  * Oracle status: the shallow full-batch MSE subset of this grammar is
  * the exact surface q_cortex_mlp value-oracles (every trial's Adam
  * trajectory unrolled into SQL). The widened knobs are deterministic
  * given the seed (seeded per-epoch dropout masks, seeded rank-loss
  * batches) but not tractably SQL-expressible — a deep trajectory with
  * per-epoch Bernoulli masks would unroll to millions of CTE terms —
  * so they are spec-pinned (trial trajectories, acceptance bookkeeping,
  * deep/shallow dispatch) rather than value-oracled, the same
  * documented boundary as the trainers' own fit tests. */
class NetSpecInterpreter(featureCols: Seq[String], targetCol: String,
    batchFraction: Double = 0.2, optimizer: String = "adam",
    scaleTarget: Boolean = true, seed: Long = 42L)
    extends CortexThink.SpecInterpreter[ModelEstimator] with Serializable {

  private val mlpKeys = Set("hidden", "layers", "lr", "epochs", "loss",
    "dropout", "activation")
  private val forestKeys = Set("trees", "depth", "trunk", "lr",
    "epochs", "loss")
  private val bottleneckKeys = Set("latent")

  private def kv(toks: Seq[String], keys: Set[String])
      : Option[Map[String, String]] = {
    val kvs = toks.map(_.split("=", 2))
    if (kvs.exists(_.length != 2)) return None
    val m = kvs.map(a => a(0) -> a(1)).toMap
    // duplicate keys or unknown knobs → the spec "does not compile"
    if (m.size != kvs.size || !m.keySet.subsetOf(keys)) None else Some(m)
  }

  def fit(train: DataFrame, spec: String): Option[ModelEstimator] = {
    val toks = spec.trim.split("\\s+").toSeq
    try {
      toks.headOption match {
        case Some("mlp") => kv(toks.tail, mlpKeys).flatMap { m =>
          // hidden XOR layers, lr + epochs required
          if (m.contains("hidden") == m.contains("layers") ||
            !m.contains("lr") || !m.contains("epochs")) None
          else {
            val (lr, ep) = (m("lr").toDouble, m("epochs").toInt)
            val loss = m.getOrElse("loss", "mse")
            if (m.contains("hidden")) {
              // shallow family has no dropout/activation knobs —
              // proposing them is a non-compiling spec, not a silent
              // ignore
              if (m.contains("dropout") || m.contains("activation")) None
              else Some(new MLPRegressor(featureCols, targetCol,
                hidden = m("hidden").toInt, lr = lr, epochs = ep,
                seed = seed, scaleTarget = scaleTarget,
                batchFraction = batchFraction, loss = loss,
                optimizer = optimizer).fit(train))
            } else Some(new DeepMLPRegressor(featureCols, targetCol,
              layers = m("layers").split(",").toSeq.map(_.toInt),
              activation = m.getOrElse("activation", "relu"), lr = lr,
              epochs = ep, seed = seed, scaleTarget = scaleTarget,
              batchFraction = batchFraction, loss = loss,
              dropoutRate = m.getOrElse("dropout", "0.0").toDouble,
              optimizer = optimizer).fit(train))
          }
        }
        case Some("forest") => kv(toks.tail, forestKeys).flatMap { m =>
          if (!Seq("trees", "depth", "lr", "epochs").forall(m.contains))
            None
          else Some(new SoftNdfRegressor(featureCols, targetCol,
            numTrees = m("trees").toInt, depth = m("depth").toInt,
            lr = m("lr").toDouble, epochs = m("epochs").toInt,
            seed = seed, batchFraction = batchFraction,
            trunkUnits = m.get("trunk")
              .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Nil),
            loss = m.getOrElse("loss", "mse"),
            optimizer = optimizer).fit(train))
        }
        case Some("bottleneck") =>
          kv(toks.tail, bottleneckKeys).flatMap { m =>
            // closed-form PCA + lstsq head — no lr/epochs knobs exist
            if (!m.contains("latent")) None
            else Some(BottleneckEncoder(featureCols, m("latent").toInt,
              Some(targetCol)).fit(train))
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def score(model: ModelEstimator, valid: DataFrame): Double =
    Metrics.r2(model.predict(valid), "prediction", targetCol, Seq.empty)
      .collect()(0).getDouble(0)
}

/** The SEQUENCE half of the widened proposal space: the reference's
  * LLM rewrites `build_model` freely, so it can propose recurrent or
  * attention stacks just as easily as dense ones
  * (keras_cortex.py:96-143; the reference ships LSTMRegressor and
  * TransformerRegressor as first-class estimators). Specs:
  *
  *   - `lstm hidden=<int> lr=<d> epochs=<int> [layers=<i,j,..>]
  *      [dropout=<d>] [loss=..]`       → [[LSTMTrainer]]
  *   - `attn dmodel=<int> ff=<int> lr=<d> epochs=<int> [heads=<int>]
  *      [blocks=<int>] [pool] [loss=..]` → [[AttnTrainer]]
  *
  * One think-loop explores across FAMILIES — dense (NetSpec), recurrent
  * and attention — over the common [[ModelEstimator]] surface. The lag
  * panel contract (lagCols ordered lag-major, seqLen) is interpreter
  * construction, like featureCols on the tabular side. Malformed or
  * family-incompatible knobs → None (the exec-failure analog). */
class SeqSpecInterpreter(lagCols: Seq[String], seqLen: Int,
    targetCol: String, batchFraction: Double = 0.2,
    optimizer: String = "adam", scaleTarget: Boolean = true,
    seed: Long = 42L)
    extends CortexThink.SpecInterpreter[ModelEstimator] with Serializable {

  private val lstmKeys = Set("hidden", "layers", "lr", "epochs",
    "dropout", "loss")
  private val attnKeys = Set("dmodel", "ff", "heads", "blocks", "pool",
    "lr", "epochs", "loss")

  private def kv(toks: Seq[String], keys: Set[String])
      : Option[Map[String, String]] = {
    // bare flags (e.g. `pool`) read as key=true
    val pairs = toks.map { t =>
      val a = t.split("=", 2)
      if (a.length == 2) a(0) -> a(1) else a(0) -> "true"
    }
    val m = pairs.toMap
    if (m.size != pairs.size || !m.keySet.subsetOf(keys)) None
    else if (!m.contains("lr") || !m.contains("epochs")) None
    else Some(m)
  }

  def fit(train: DataFrame, spec: String): Option[ModelEstimator] = {
    val toks = spec.trim.split("\\s+").toSeq
    try {
      toks.headOption match {
        case Some("lstm") => kv(toks.tail, lstmKeys).flatMap { m =>
          if (!m.contains("hidden")) None
          else Some(new LSTMTrainer(lagCols, seqLen, targetCol,
            hidden = m("hidden").toInt, lr = m("lr").toDouble,
            epochs = m("epochs").toInt, seed = seed,
            scaleTarget = scaleTarget, batchFraction = batchFraction,
            layers = m.get("layers").map(_.split(",").toSeq.map(_.toInt))
              .getOrElse(Nil),
            dropout = m.getOrElse("dropout", "0.0").toDouble,
            loss = m.getOrElse("loss", "mse"),
            optimizer = optimizer).fit(train))
        }
        case Some("attn") => kv(toks.tail, attnKeys).flatMap { m =>
          if (!m.contains("dmodel") || !m.contains("ff")) None
          else Some(new AttnTrainer(lagCols, seqLen, targetCol,
            dModel = m("dmodel").toInt, ffDim = m("ff").toInt,
            lr = m("lr").toDouble, epochs = m("epochs").toInt,
            seed = seed, scaleTarget = scaleTarget,
            batchFraction = batchFraction,
            numHeads = m.getOrElse("heads", "1").toInt,
            numBlocks = m.getOrElse("blocks", "1").toInt,
            attnPool = m.getOrElse("pool", "false").toBoolean,
            loss = m.getOrElse("loss", "mse"),
            optimizer = optimizer).fit(train))
        }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def score(model: ModelEstimator, valid: DataFrame): Double =
    Metrics.r2(model.predict(valid), "prediction", targetCol, Seq.empty)
      .collect()(0).getDouble(0)
}

/** `"ridge feature=<col> lambda=<double>"` → per-era single-feature
  * no-intercept ridge, fit and scored RELATIONALLY:
  *
  *   β_era = Σ x·y / (Σ x² + λ·n)   over the train split, per era;
  *   R²    = 1 − Σ(y − β_era·x)² / Σ(y − ȳ)²   over the valid split.
  *
  * The fit is ONE map-side-combined groupBy producing ≤ |eras| rows
  * (sufficient statistics, never the rows); scoring broadcasts the era
  * betas back and reduces to a single scalar. Closed-form per-era
  * solving is the same shape FeatureNeutralizer's lstsq already uses —
  * and, unlike an iterative NN fit, every trial is exactly
  * SQL-expressible, which is what lets the think-loop run under a FULL
  * value oracle (q_cortex). */
class RidgeEraSpecInterpreter(targetCol: String, eraCol: String)
    extends CortexThink.SpecInterpreter[RidgeEraModel] with Serializable {
  private val pat =
    """^ridge feature=([A-Za-z0-9_]+) lambda=(\d+(?:\.\d+)?)$""".r

  /** The fitted "model": the feature name plus a ≤|eras|-row
    * (era, __beta) frame — the frame stays lazy, so fit+score together
    * cost exactly one aggregate job and one metric job per trial. */
  def fit(train: DataFrame, spec: String): Option[RidgeEraModel] =
    spec match {
      case pat(feature, lam) =>
        val x = col(feature).cast("double")
        val y = col(targetCol).cast("double")
        Some(RidgeEraModel(feature, train.groupBy(col(eraCol))
          .agg((sum(x * y) /
            (sum(x * x) + lit(lam.toDouble) * count(lit(1))))
            .as("__beta"))))
      case _ => None
    }

  def score(model: RidgeEraModel, valid: DataFrame): Double = {
    val joined = valid.join(broadcast(model.betas), Seq(eraCol))
    val y = col(targetCol).cast("double")
    val pred = col("__beta") * col(model.feature).cast("double")
    // Σ(y−ȳ)² = Σy² − (Σy)²/n keeps the metric ONE scalar aggregate —
    // the identical algebra the SQL oracle reproduces term for term
    val r = joined.agg(
      sum((y - pred) * (y - pred)).as("ss_res"),
      sum(y * y).as("syy"), sum(y).as("sy"),
      count(lit(1)).cast("double").as("n")).first()
    1.0 - r.getDouble(0) /
      (r.getDouble(1) - r.getDouble(2) * r.getDouble(2) / r.getDouble(3))
  }
}

/** Per-era ridge fit: the spec'd feature and its per-era betas. */
case class RidgeEraModel(feature: String, betas: DataFrame)
