package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Similarity
import graft.functions.FastRound

/** TRAINED quality classifier — the CCNet / GPT-3-style filter (Wenzek
  * et al. 2020, arXiv:1911.00359 §4.4; Brown et al. 2020 Appendix A —
  * both public): a linear classifier over hashed bag-of-words features
  * scores every document's similarity to a target "high-quality" domain,
  * and the corpus keeps what scores above threshold. The heuristic
  * quality signals ([[QualityFilterTransformer]], [[GopherRules]]) catch
  * boilerplate; the trained filter catches DISTRIBUTIONAL quality, which
  * is why production pipelines run both.
  *
  * Re-expressed deterministically: features from [[HashingVectorizer]]'s
  * md5 bucket/sign stream (+ an intercept coordinate), labels from any
  * caller rule (the CCNet trick — a trusted source is the positive
  * class), and the fit is FULL-BATCH logistic-regression gradient
  * descent with a fixed iteration count and a round-6 weight snap per
  * step, so the whole trajectory is reproducible cross-engine and the
  * fit + scoring verify under an unrolled DuckDB oracle (the same
  * determinism contract as [[graft.sim.KMeans]] / UmapAnalog).
  *
  * SCALE SHAPES: the feature frame is computed ONCE (localCheckpoint —
  * every epoch and the final scoring read the materialized columns, not
  * the tokenizer); each epoch is one map-side-combined aggregate of
  * dim+1 partial means (the gradient), one tiny collect, zero shuffles
  * of the corpus. Scoring is a scan-speed literal-weights projection.
  * This fold-per-coordinate form is right for the demo dims (≤ 4096,
  * the HashingVectorizer cap); at fasttext-scale dims (2^20) the
  * gradient becomes the explode + groupBy(bucket) form — same algebra,
  * vocabulary-sized shuffle.
  */
object QualityClassifier {

  /** (doc_id-preserving) feature frame: `fvec` = hashed dim-vector with
    * the intercept 1.0 appended, `y` = the label rule as 0/1. */
  def features(docs: DataFrame, textCol: String, label: Column,
      dim: Int): DataFrame =
    HashingVectorizer.vectorize(docs, textCol, dim, out = "__hv")
      .withColumn("fvec", concat(col("__hv"), array(lit(1.0d))))
      .withColumn("y", label.cast("boolean").cast("double"))
      .drop("__hv")

  /** Fixed-`iters` full-batch logistic GD from w = 0, round-6 weight
    * snap per step. Returns the dim+1 weights (last = intercept).
    * `feats` must carry (fvec, y) as produced by [[features]]. */
  def fit(feats: DataFrame, dim: Int, iters: Int, lr: Double)
      : Array[Double] = {
    var w = new Array[Double](dim + 1)
    var t = 0
    while (t < iters) {
      val margin = Similarity.dot(col("fvec"), typedlit(w))
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val aggs = (0 to dim).map(j =>
        avg(element_at(col("fvec"), j + 1) * (p - col("y"))).as(s"g$j"))
      val g = feats.agg(aggs.head, aggs.tail: _*).head()
      w = Array.tabulate(dim + 1)(j =>
        FastRound.compute(w(j) - lr * g.getDouble(j), 1e6, 6))
      t += 1
    }
    w
  }

  /** Score with literal weights: (docs columns) + round-6 `clf_score`
    * (σ(w·x)) + `clf_keep` (score ≥ threshold) — a pure projection. */
  def score(feats: DataFrame, w: Array[Double],
      threshold: Double = 0.5): DataFrame = {
    val margin = Similarity.dot(col("fvec"), typedlit(w))
    feats
      .withColumn("clf_score",
        FastRound(lit(1.0) / (lit(1.0) + exp(-margin)), 6))
      .withColumn("clf_keep", col("clf_score") >= threshold)
  }

  /** fit + score in one call over raw docs. */
  def fitScore(docs: DataFrame, textCol: String, label: Column, dim: Int,
      iters: Int, lr: Double, threshold: Double = 0.5): DataFrame = {
    val feats = features(docs, textCol, label, dim).localCheckpoint()
    score(feats, fit(feats, dim, iters, lr), threshold)
  }
}
