package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446,
  * Table A1) — the standard hand-tuned document filter every large-scale
  * pretraining pipeline applies before model-based scoring. Each rule is
  * an independent boolean; a document is kept iff every rule passes, and
  * the per-rule bits are emitted so downstream analysis can attribute
  * drops (the usual curation dashboard shape).
  *
  * Rules implemented (thresholds from the paper, word bounds scaled to
  * this corpus's document lengths):
  *   1. word count within [minWords, maxWords]
  *   2. mean word length within [3, 10]
  *   3. symbol-to-word ratio ("#" or "...") <= 0.1
  *   4. fraction of words containing an alphabetic character >= 0.8
  *   5. at least `minStopwords` occurrences of the stopword list
  *
  * (The paper's line-shape rules — bullet-start / ellipsis-end line
  * fractions — are degenerate on this single-line corpus and fold into
  * rule 3's symbol ratio.)
  *
  * All pure codegen'd Column expressions over one `split` — map-side at
  * scan speed, no shuffle, no UDF; the DuckDB oracle mirrors every rule
  * on the same tokenization. No reference counterpart (SURVEY.md §7.6).
  */
object GopherRules {

  /** Gopher's stopword list (Table A1). */
  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def ruleNames: Seq[String] =
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_alpha_frac", "r_stopwords")

  /** Appends n_words, mean_word_len, alpha_frac, n_stopwords, the five
    * rule bits, and `keep` (AND of all rules). */
  def battery(df: DataFrame, textCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      minStopwords: Int = 2): DataFrame = {
    val w = CorpusOps.words(col(textCol))
    val nW = size(col("__w")).cast("long")
    df.withColumn("__w", w)
      .withColumn("n_words", nW)
      .withColumn("mean_word_len",
        when(nW > 0, aggregate(col("__w"), lit(0L),
          (acc, x) => acc + length(x)).cast("double") / nW))
      .withColumn("__n_sym",
        size(regexp_extract_all(col(textCol), lit("#|\\.\\.\\."), lit(0))))
      .withColumn("alpha_frac",
        when(nW > 0, size(filter(col("__w"),
          x => x.rlike("[a-z]"))).cast("double") / nW))
      .withColumn("n_stopwords",
        size(filter(col("__w"),
          x => array_contains(array(stopwords.map(lit): _*), x)))
          .cast("long"))
      .withColumn("r_word_count", nW >= minWords && nW <= maxWords)
      .withColumn("r_mean_word_len",
        col("mean_word_len").isNotNull &&
          col("mean_word_len") >= 3 && col("mean_word_len") <= 10)
      .withColumn("r_symbol_ratio",
        nW > 0 && col("__n_sym").cast("double") / nW <= 0.1)
      .withColumn("r_alpha_frac",
        col("alpha_frac").isNotNull && col("alpha_frac") >= 0.8)
      .withColumn("r_stopwords", col("n_stopwords") >= minStopwords)
      .withColumn("keep", ruleNames.map(col).reduce(_ && _))
      .drop("__w", "__n_sym")
  }
}
