package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe hyperparameter search over era panels — the
  * composition the reference gets for free from sklearn
  * (`GridSearchCV(make_pipeline(...), param_grid, cv=...)`; its
  * estimators expose get_params/set_params exactly so this works —
  * reference `keras_estimators/base.py`, README pipeline section),
  * re-expressed over [[graft.operators.PurgedKFold]]: every candidate
  * fits on each fold's purged-train eras and scores on the fold's
  * test eras, the winner is the best MEAN score across folds, and the
  * winning candidate refits on the full frame (sklearn's
  * `refit=True`).
  *
  * Scale shape: the (grid × folds) loop is DRIVER-orchestrated and
  * bounded by contract (a param grid is enumerable by definition —
  * sklearn's is too); each fit/score inside it is a distributed job
  * over the full data. Fold membership is resolved ONCE on the tiny
  * era spine ([[graft.operators.PurgedKFold.eraRoles]] — E·k rows,
  * calendar-bounded) and collected to era LISTS, so every per-fold
  * train/test frame is a plain pushed-down `era IN (...)` filter on
  * the fact table — no row explosion (assignRows would multiply the
  * corpus by k), no join, and the parquet scan prunes on the filter.
  * Fit functions are caller-supplied (the [[graft.operators
  * .FitPipeline]] / closed-form-head shapes both fit); scorers
  * compose from [[Metrics]] (r2, spearman).
  */
object GridSearch {

  /** One (candidate, fold) evaluation. */
  case class Trial[P](param: P, fold: Int, score: Double)

  /** The full search record: every trial, per-candidate mean scores
    * (grid order), the winning candidate, and its full-frame refit. */
  case class Result[P, M](trials: Seq[Trial[P]],
      meanScores: Seq[(P, Double)], best: P, model: M)

  /** Run the sweep. `fit(param, train)` returns a fitted model;
    * `score(model, test)` returns a scalar where LARGER IS BETTER
    * (negate a loss). Ties on the mean break to the earliest grid
    * position — deterministic, like sklearn's first-best rule. Folds
    * whose train or test slice is era-empty are skipped (contributing
    * nothing to that candidate's mean) — with a sane k and embargo
    * this does not happen; a fully era-empty sweep is refused. */
  def search[P, M](df: DataFrame, eraCol: String, k: Int, embargo: Int,
      grid: Seq[P], fit: (P, DataFrame) => M,
      score: (M, DataFrame) => Double): Result[P, M] = {
    require(grid.nonEmpty, "grid search: empty candidate grid")
    // fold membership on the era spine, once; E·k rows -> driver lists
    val roles = graft.operators.PurgedKFold
      .eraRoles(df, eraCol, k, embargo)
      .collect().map(r => (r.get(0), r.getInt(1), r.getString(2)))
    val byFold = (0 until k).map { f =>
      val inFold = roles.filter(_._2 == f)
      (f, inFold.filter(_._3 == "train").map(_._1).toSeq,
        inFold.filter(_._3 == "test").map(_._1).toSeq)
    }
    def slice(eras: Seq[Any]) =
      df.where(col(eraCol).isin(eras: _*)) // pushed-down IN filter
    // The (candidate × fold) trials are independent, and each one is a
    // couple of SMALL jobs (an aggregate over a pushed-down era slice);
    // run sequentially the sweep is a chain of sub-second jobs that
    // each leave most of the cluster idle (measured: q_grid_search =
    // ~25 back-to-back ~250ms 3-task jobs). Submit them from a bounded
    // thread pool so concurrent trials back-fill each other's task
    // tails — guide §2.6 "overlap independent jobs". Execution order
    // does not touch any trial's plan or float arithmetic (each trial
    // aggregates its own slice), so results are bit-identical to the
    // sequential sweep; the trials list keeps deterministic
    // (grid-order × fold-order) sequence because futures are awaited
    // in construction order.
    val work = for {
      p <- grid
      (f, trainEras, testEras) <- byFold
      if trainEras.nonEmpty && testEras.nonEmpty
    } yield (p, f, trainEras, testEras)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, work.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val trials = try {
      val fs = work.map { case (p, f, trainEras, testEras) =>
        scala.concurrent.Future(
          Trial(p, f, score(fit(p, slice(trainEras)), slice(testEras))))
      }
      fs.map(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
    require(trials.nonEmpty,
      "grid search: every fold had an empty train or test era set — " +
        s"k=$k embargo=$embargo leaves no usable split")
    val means = grid.map(p =>
      p -> {
        val s = trials.filter(_.param == p).map(_.score)
        s.sum / s.size
      })
    // first-best: strictly-greater comparison in grid order
    val best = means.maxBy(_._2) match {
      case (_, m) => means.find(_._2 == m).get._1
    }
    Result(trials, means, best, fit(best, df))
  }
}
