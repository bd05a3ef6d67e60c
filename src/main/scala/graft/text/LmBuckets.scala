package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020,
  * arXiv:1911.00359 §4.3): score every document with the corpus-trained
  * LM ([[NgramLm.scoreStupidBackoff]]), then split the corpus into
  * head / middle / tail terciles by score — the standard quality
  * stratification step before mixing pretraining data (head = most
  * fluent third, tail = least). CCNet buckets by perplexity ascending;
  * avg log-prob descending is the same ordering.
  *
  * Cut points are the exact 1/3 and 2/3 quantiles of the ROUNDED scores
  * (one tiny two-value aggregate, broadcast back as scalars — never a
  * global sort or an unpartitioned window), so labeling is a map-side
  * comparison and the whole plan shuffles only for the LM joins the
  * score already needs. Documents too short to score (no bigrams) land
  * in `tail` by definition. At 100 TB the cut-point aggregate is the
  * one piece that buffers all n scores on a reducer — set
  * `approxCuts = true` to swap it for `approx_percentile` (mergeable
  * bounded sketch, map-side partials, no full-score reducer buffer;
  * bucket boundaries tolerate approximation — same guidance as
  * [[graft.operators.Percentiles]]). Exact by default so the buckets
  * verify bit-for-bit against the DuckDB oracle; the approx plan shape
  * and cut tolerance are pinned in PlanSpec.
  */
object LmBuckets {

  private val liveCaches =
    graft.operators.GraftTransformer.newCacheQueue()

  /** (idCol, n_bigrams, avg_logprob, bucket) for every document. */
  def headMiddleTail(docs: DataFrame, idCol: String, textCol: String,
      approxCuts: Boolean = false, accuracy: Int = 10000): DataFrame = {
    liveCaches.release()
    // the LM scoring joins run ONCE: the scored frame materializes
    // EAGERLY (localCheckpoint, same MEMORY_AND_DISK storage class)
    // before either consumer is submitted. A lazy persist() is not
    // enough here: the cut-point aggregate is the BROADCAST side of
    // the labeling crossJoin, so AQE submits both consumers
    // concurrently and they race the cold cache — the whole LM
    // scoring ran twice (measured as two ~2-3s CPU stages over the
    // same exchange).
    // size bound (CheckpointPolicy): corpus-ROW-proportional but NARROW
    // — (id, n_bigrams, avg_logprob) ≈ 24B/doc; the text itself never
    // materializes. Respell as a written intermediate at cluster scale.
    val scored = liveCaches.keep(
      NgramLm.scoreStupidBackoff(docs, idCol, textCol)
        .withColumn("avg_logprob",
          graft.functions.FastRound(col("avg_logprob"), 6))
        .localCheckpoint(eager = true))
    val qAgg =
      if (approxCuts)
        expr(s"approx_percentile(avg_logprob, array(${1.0 / 3}, " +
          s"${2.0 / 3}), $accuracy)")
      else graft.functions.ExactPercentiles(
        col("avg_logprob"), Seq(1.0 / 3, 2.0 / 3))
    val cuts = scored.where(col("avg_logprob").isNotNull)
      .agg(qAgg.as("__q"))
      .select(
        graft.functions.FastRound(element_at(col("__q"), 1), 6).as("__c1"),
        graft.functions.FastRound(element_at(col("__q"), 2), 6).as("__c2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("avg_logprob") >= col("__c2"), "head")
          .when(col("avg_logprob") >= col("__c1"), "middle")
          .otherwise("tail"))
      .drop("__c1", "__c2")
  }
}
