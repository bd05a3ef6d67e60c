package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span detection — the position-level exact
  * substring dedup of Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better" (arXiv:2107.06499 — public paper), re-expressed
  * relationally: a word `k`-gram starting at some position is a DUPLICATED
  * SPAN iff the identical k-gram occurs anywhere else in the corpus
  * (another document, or another position of the same document). The
  * per-document outputs are the paper's curation signals: the
  * duplicated-SPAN count and fraction (`n_dup_spans`, `dup_frac` =
  * n_dup_spans / n_spans), and the token-coverage count `n_dup_tokens`
  * (tokens under at least one duplicated span, overlaps merged) with
  * `n_tokens` alongside, so the coverage FRACTION — Lee et al.'s "what
  * share of the text is duplicated" number — is `n_dup_tokens /
  * n_tokens`.
  *
  * The suffix-array machinery of the paper is a single-machine design; the
  * Spark-first shape is two pre-aggregated exchanges on a fixed-width
  * fingerprint key:
  *   1. every (doc, pos) k-gram is fingerprinted with md5 (32-byte key —
  *      the shuffle never carries gram text),
  *   2. corpus-wide counts per fingerprint run as a map-side-combined
  *      groupBy (hot boilerplate grams count in parallel partials),
  *   3. positions join back to the `count > 1` fingerprints on an
  *      equi-join (shuffle join by default — BOTH sides are corpus-sized;
  *      at 100 TB neither broadcasts),
  *   4. token coverage explodes each duplicated position to its k token
  *      indices and counts distinct per doc — no per-document buffering
  *      of position arrays anywhere.
  * Every step is a scan-speed projection or a key-partitioned exchange;
  * nothing is quadratic and no operator holds a whole hot group in one
  * task.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object DupSpans {

  /** (base = (idCol, __w), dup = (idCol, pos)): every duplicated span
    * position, shared by the stats and the range-extraction outputs. */
  private def dupPositions(docs: DataFrame, idCol: String,
      textCol: String, k: Int): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol),
      CorpusOps.words(col(textCol)).as("__w"))
    // 1-based span positions, fingerprinted; docs shorter than k emit no
    // grams (wordNgrams returns an empty array) and rejoin at step 4
    val grams = base
      .select(col(idCol),
        posexplode(CorpusOps.wordNgrams(col("__w"), k))
          .as(Seq("__p0", "__gram")))
      .select(col(idCol), (col("__p0") + 1).as("pos"),
        md5(col("__gram")).as("__fp"))
    val dupFps = grams.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__c")).where(col("__c") > 1)
      .select(col("__fp"))
    (base, grams.join(dupFps, Seq("__fp")))
  }

  /** One row per input document:
    * (idCol, n_tokens, n_spans, n_dup_spans, n_dup_tokens, dup_frac). */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val (base, dup) = dupPositions(docs, idCol, textCol, k)
    val cov = dup
      .select(col(idCol), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("__t"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("pos")).as("n_dup_spans"),
        countDistinct(col("__t")).as("n_dup_tokens"))
    val nSpans = greatest(size(col("__w")) - (k - 1), lit(0))
      .cast("long")
    base
      .select(col(idCol), size(col("__w")).cast("long").as("n_tokens"),
        nSpans.as("n_spans"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        when(col("n_spans") > 0,
          coalesce(col("n_dup_spans"), lit(0L)).cast("double")
            / col("n_spans"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Lee et al.'s actionable artifact: the MERGED duplicated intervals
    * per document — `(idCol, span_start, span_end, span_tokens)`,
    * 1-based inclusive token indices — ready for excision. Each
    * duplicated k-gram position covers `[pos, pos+k−1]`; runs whose
    * positions are within `k` of each other cover overlapping OR
    * back-to-back token ranges, so they merge into one interval (a new
    * interval starts only when `pos − prev_pos > k`, i.e. a genuine
    * coverage gap).
    *
    * Shape: the classic island-detection window — one `lag` + running
    * sum over a PER-DOCUMENT window (partitioned by the doc id: bounded
    * by document length, never corpus-sized), then a map-side-combined
    * groupBy over (doc, island). Everything upstream is
    * [[spanStats]]'s fingerprint-keyed machinery unchanged. */
  def spanRanges(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val (_, dup) = dupPositions(docs, idCol, textCol, k)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val brk = when(col("pos") - lag(col("pos"), 1).over(w) > k, 1)
      .otherwise(0) // first row: lag is null → comparison null → 0
    dup.select(col(idCol), col("pos"))
      .withColumn("__isl", sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("__lo"), max(col("pos")).as("__hi"))
      .select(col(idCol), col("__lo").cast("long").as("span_start"),
        (col("__hi") + lit(k - 1)).cast("long").as("span_end"),
        (col("__hi") + lit(k - 1) - col("__lo") + 1).cast("long")
          .as("span_tokens"))
  }

  /** The excision step itself: drop every token under a merged
    * duplicated interval and reassemble the remainder —
    * `(idCol, n_tokens, n_removed, clean_text)`. Lee et al. cut ONE
    * copy and keep another; cutting every covered token (this
    * operator) is the conservative boilerplate-removal form, the same
    * policy [[SegmentDedup]] applies at segment granularity.
    *
    * Shape: [[spanRanges]] unchanged, its per-doc intervals gathered by
    * a map-side-combined `collect_list` (bounded by doc length / k),
    * one LEFT join back to the corpus, and the cut a scan-speed filter
    * over (position, intervals) — O(tokens · intervals) per row, no
    * second corpus shuffle. */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val ranges = spanRanges(docs, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__rs"))
    docs.select(col(idCol), CorpusOps.words(col(textCol)).as("__w"))
      .join(ranges, Seq(idCol), "left")
      .select(col(idCol), col("__w"),
        coalesce(col("__rs"), array().cast(
          "array<struct<span_start:bigint,span_end:bigint>>")).as("__rs"))
      .withColumn("__keep", filter(col("__w"), (_, i) =>
        !exists(col("__rs"), r =>
          (i + 1).cast("long") >= r.getField("span_start") &&
            (i + 1).cast("long") <= r.getField("span_end"))))
      .select(col(idCol), size(col("__w")).cast("long").as("n_tokens"),
        (size(col("__w")) - size(col("__keep"))).cast("long")
          .as("n_removed"),
        array_join(col("__keep"), " ").as("clean_text"))
  }
}
