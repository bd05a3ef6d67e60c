package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169), re-expressed relationally: score every raw
  * document with the log importance weight of a hashed n-gram
  * bag-of-words model — ln p_target(x) − ln p_raw(x) — then keep a
  * Gumbel-top-fraction sample, which is exactly sampling without
  * replacement with probability proportional to the importance weight.
  * This is the principled form of "make the crawl look like the
  * high-quality domain" that per-source rate sampling
  * ([[CorpusSplit.sampleByRate]]) applies by hand and unigram KL
  * ([[SourceKl]]) diagnoses.
  *
  * Both bag models live in ONE bucket-count table: features (unigrams +
  * bigrams, the paper's §3 choice) hash into `buckets` slots, and a
  * single map-side-combined groupBy counts every slot's raw and target
  * occurrences together. The add-α smoothed log-ratio
  *
  *   λ[b] = ln( ((c_t[b]+α)/(T_t+αB)) / ((c_r[b]+α)/(T_r+αB)) )
  *
  * is a `buckets`-row frame that broadcast-joins back onto the feature
  * stream, so scoring is scan-speed: explode, hash, broadcast lookup,
  * one per-doc sum. The per-document reduction folds λ in pinned
  * POSITION order (the [[NgramLm]] deterministic-sum pattern), so the
  * result is bit-identical across any partitioning and across engines.
  *
  * Resampling adds Gumbel noise g = −ln(−ln(u)) from the md5-uniform
  * draw ([[CorpusSplit.hashUniform]] — deterministic, reproducible,
  * growth-stable) and keeps documents whose key = log_w + g clears the
  * (1 − keepFrac) exact quantile — ONE tiny scalar aggregate broadcast
  * back (the [[LmBuckets]] cut-point shape), never a global sort. At
  * 100 TB swap the cut for `approx_percentile` exactly as LmBuckets
  * documents; exact by default so the keep set verifies bit-for-bit.
  *
  * Scale shape: the corpus is scanned twice (count pass, score pass)
  * over a persisted bucketized projection; the only shuffles are the
  * `buckets`-row count aggregate and the per-doc sum. Nothing is
  * vocabulary-sized — hashing bounds the model at `buckets` rows no
  * matter how large the corpus, which is the reason DSIR (and this
  * plan) works at web scale.
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object Dsir {

  private val liveCaches =
    graft.operators.GraftTransformer.newCacheQueue()

  private def bucketOf(t: Column, buckets: Int): Column =
    Dedup.md5Chunk(t, 1, 13) % buckets

  /** (idCol, n_feats, log_w) for every document: the log importance
    * weight of the hashed-n-gram bag model fit on `isTarget` docs
    * (target) vs the whole of `docs` (raw). Documents with no features
    * get n_feats = 0 and a null log_w. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256,
      alpha: Double = 1.0): DataFrame = {
    liveCaches.release()
    // one corpus-sized projection: per-doc hashed feature buckets in
    // position order, persisted for the two passes (counts, scoring)
    val bucketized = liveCaches.keep(docs
      .select(col(idCol), isTarget.cast("int").as("__tgt"),
        CorpusOps.words(col(textCol)).as("__w"))
      .select(col(idCol), col("__tgt"),
        transform(concat(col("__w"), CorpusOps.wordNgrams(col("__w"), 2)),
          t => bucketOf(t, buckets)).as("__bs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // both bag models in one map-side-combined pass: ≤ `buckets` rows
    val counts = bucketized
      .select(col("__tgt"), explode(col("__bs")).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("__cr"), sum(col("__tgt")).as("__ct"))

    // totals: one bounded scalar row off the bucket table
    val tot = counts.agg(sum(col("__cr")).cast("double"),
      sum(col("__ct")).cast("double")).head()
    val (tRaw, tTgt) = (tot.getDouble(0), tot.getDouble(1))
    val aB = alpha * buckets

    val lam = counts.select(col("b"),
      log(((col("__ct") + alpha) / (tTgt + aB)) /
        ((col("__cr") + alpha) / (tRaw + aB))).as("__lam"))

    // scoring: scan-speed broadcast lookup + position-ordered fold
    val perDoc = bucketized
      .select(col(idCol), posexplode(col("__bs")).as(Seq("__pos", "b")))
      .join(broadcast(lam), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        aggregate(
          sort_array(collect_list(struct(col("__pos"), col("__lam")))),
          lit(0d), (acc, x) => acc + x.getField("__lam")).as("log_w"))

    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"), col("log_w"))
  }

  /** importanceWeights + the Gumbel-top-fraction keep decision:
    * (idCol, n_feats, log_w, key, keep). Keys and the cut are rounded
    * to 6 decimals before comparing so the boundary is engine-stable;
    * featureless documents (null key) are never kept. `approxCut`
    * swaps the exact quantile for the mergeable `approx_percentile`
    * sketch (no full-key reducer buffer) — the 100 TB form; exact by
    * default so the keep set oracles bit-for-bit. */
  def resample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, keepFrac: Double, buckets: Int = 256,
      alpha: Double = 1.0, approxCut: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, s"keepFrac out of (0,1): $keepFrac")
    val u = CorpusSplit.hashUniform(col(idCol))
    // scored once, read twice (cut-point aggregate + keep labeling)
    val weighted = liveCaches.keep(
      importanceWeights(docs, idCol, textCol, isTarget, buckets, alpha)
        .withColumn("key", graft.functions.FastRound(
          col("log_w") - log(-log(u)), 6))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val qAgg =
      if (approxCut)
        expr(s"approx_percentile(key, ${1.0 - keepFrac}, $accuracy)")
      else element_at(graft.functions.ExactPercentiles(
        col("key"), Seq(1.0 - keepFrac)), 1)
    val cut = weighted.where(col("key").isNotNull)
      .agg(qAgg.as("__q"))
      .select(graft.functions.FastRound(col("__q"), 6).as("__cut"))
    weighted.crossJoin(broadcast(cut))
      .withColumn("keep",
        col("key").isNotNull && col("key") >= col("__cut"))
      .drop("__cut")
  }
}
