package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining — the phrase-detection step that turns
  * "new york" into one token before vocabulary building (Mikolov et
  * al. 2013 §4 use the count-ratio score; pointwise mutual information
  * is its principled form, Church & Hanks 1990):
  *
  *   pmi(w1, w2) = ln( c12 · N / (c1 · c2) )
  *
  * over corpus-wide unigram counts c1, c2 (N = total tokens) and
  * adjacent-bigram counts c12. High-PMI, high-count bigrams are
  * phrases; `minCount` suppresses the low-frequency noise PMI is
  * notoriously fond of (a bigram seen twice between two hapaxes maxes
  * the score).
  *
  * Training IS aggregation, exactly like [[NgramLm]]: two map-side-
  * combined count tables (vocabulary-sized shuffles — at real corpora
  * both partial-aggregate before the exchange), then the bigram table
  * joins its two unigram legs. The bigram table is pre-filtered to
  * `minCount` BEFORE the joins, so the join input is the candidate
  * set, not the corpus. No per-doc state, no windows, nothing
  * quadratic; the ranked output is a top-k over the candidate table —
  * the `rank <= k` filter on the unpartitioned row_number window is
  * rewritten by Catalyst's LimitPushDownThroughWindow into
  * TakeOrderedAndProject (bounded per-task heaps, no global sort; the
  * same shape [[CorpusSplit.topVocab]] pins in PlanSpec).
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object Collocations {

  /** Top-`k` collocations by PMI (ties to the lexicographic bigram):
    * (bigram, c12, c1, c2, pmi, rank). Only bigrams with
    * c12 >= minCount compete. */
  def topPmi(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    val w: Column = CorpusOps.words(col(textCol))
    // BOTH count tables from ONE tokenize pass and ONE shuffle (the
    // NgramLm kind-tagged explode, guide §2.3): unigrams and bigrams
    // explode together tagged by kind and the combined count table
    // localCheckpoints. Previously the corpus tokenization ran once
    // for the unigram aggregate, once for the bigram aggregate, and
    // AGAIN per consumer (the N scalar's eager head plus the two
    // unigram join legs re-planned the corpus pass — exchange reuse
    // across an eager action boundary never fires). Counts are
    // integers, so the split-back tables exactly equal the
    // two-aggregation form. Checkpoint bound: the materialized frame
    // is VOCABULARY-sized (distinct unigrams + distinct bigrams with
    // a count each) — the same table the old plan already shuffled,
    // never corpus-sized.
    val counts = docs.select(w.as("__w"))
      .select(explode(concat(
        transform(col("__w"),
          t => struct(lit(0).as("k"), t.as("key"))),
        transform(CorpusOps.wordNgrams(col("__w"), 2),
          g => struct(lit(1).as("k"), g.as("key"))))).as("e"))
      .groupBy(col("e.k").as("__k"), col("e.key").as("__key"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val uni = counts.where(col("__k") === 0)
      .select(col("__key").as("t"), col("__c").as("c"))
    val bi = counts.where(col("__k") === 1)
      .select(col("__key").as("bigram"), col("__c").as("c12"))
      .where(col("c12") >= minCount)
    // N: one bounded scalar off the unigram table
    val n = uni.agg(sum(col("c")).cast("double")).head().getDouble(0)
    val scored = bi
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__w2", split(col("bigram"), " ").getItem(1))
      .join(uni.withColumnRenamed("t", "__w1")
        .withColumnRenamed("c", "c1"), Seq("__w1"))
      .join(uni.withColumnRenamed("t", "__w2")
        .withColumnRenamed("c", "c2"), Seq("__w2"))
      .select(col("bigram"), col("c12"), col("c1"), col("c2"),
        log(col("c12") * lit(n) / (col("c1") * col("c2"))).as("pmi"))
    // rank on the ROUND-6 pmi (the repo's FastRound-before-compare
    // convention, as in Dsir/ProtoPrune/QuantileBinner): the unrounded
    // double depends on each engine's libm ln, so a last-ulp difference
    // at the rank-k boundary would flip ranks k/k+1 cross-engine
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(graft.functions.FastRound(col("pmi"), 6).desc,
            col("bigram"))))
      .where(col("rank") <= k)
  }
}
