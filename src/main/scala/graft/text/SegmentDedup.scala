package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide repeated-segment removal — the line/paragraph dedup step
  * of CCNet (Wenzek et al. 2020 §4.1, which removes duplicated
  * paragraphs before LM filtering) and RefinedWeb (Penedo et al. 2023,
  * arXiv:2306.01116, "line-wise corrections"): boilerplate — navigation
  * chrome, cookie banners, license footers — repeats VERBATIM across
  * thousands of pages, so any segment whose exact fingerprint occurs
  * more than `maxOccurrences` times corpus-wide is excised from every
  * document, and the cleaned text is reassembled in order. This is the
  * *sub-document* companion of exact dedup: exactGroups drops whole
  * duplicate documents, this drops the repeated parts of otherwise
  * unique ones.
  *
  * Documents here carry no newlines, so the segmentation unit is a
  * fixed window of `segWords` consecutive words (non-overlapping, tail
  * remainder kept) — the same relational shape as newline/paragraph
  * splitting, with the splitter swappable.
  *
  * Spark shape (all corpus-safe):
  *   1. segment + fingerprint: one projection + posexplode (no state);
  *   2. fingerprint counts: map-side-combined groupBy — the degenerate
  *      hot key (one banner on every page) counts in parallel partials;
  *   3. segments join counts on the fingerprint: shuffle equi-join,
  *      both sides corpus-sized by design (same shape as
  *      [[DupSpans]]) — at 100 TB neither side broadcasts;
  *   4. reassembly: per-doc sorted collect_list — bounded by DOCUMENT
  *      length (segments per doc), never corpus-sized.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object SegmentDedup {

  /** Non-overlapping `segWords`-word segments of a word array, tail
    * remainder included; 0-based segment index. */
  private def segments(w: Column, segWords: Int): Column =
    when(size(w) > 0,
      transform(
        sequence(lit(0), ((size(w) - 1) / segWords).cast("int")),
        i => array_join(slice(w, i * segWords + 1, lit(segWords)), " ")))
      .otherwise(array().cast("array<string>"))

  /** One row per document:
    * (idCol, n_segments, n_dropped, clean_text) — clean_text is the
    * document with every over-frequent segment excised, segments
    * rejoined with single spaces; untouched docs round-trip their
    * normalized (single-spaced, lowercased-token) form. */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, maxOccurrences: Int = 2): DataFrame = {
    val segs = docs
      .select(col(idCol),
        posexplode_outer(segments(CorpusOps.words(col(textCol)), segWords))
          .as(Seq("__i", "__seg")))
      .withColumn("__fp", md5(col("__seg")))
    val counts = segs.where(col("__seg").isNotNull)
      .groupBy(col("__fp")).agg(count(lit(1)).as("__c"))
    val joined = segs.join(counts, Seq("__fp"), "left")
    joined.groupBy(col(idCol))
      .agg(
        count(col("__seg")).as("n_segments"),
        sum(when(col("__c") > maxOccurrences, 1L).otherwise(0L))
          .as("n_dropped"),
        array_sort(collect_list(
          when(col("__c") <= maxOccurrences,
            struct(col("__i"), col("__seg"))))).as("__kept"))
      .select(col(idCol), col("n_segments"), col("n_dropped"),
        array_join(transform(col("__kept"), x => x.getField("__seg")), " ")
          .as("clean_text"))
  }
}
