package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.GraftTransformer

/** Text-analysis operators for large-scale training-data pipelines:
  * per-document statistics, quality scoring, token counting, language-ID
  * heuristic, and document fingerprinting. All pure Column expressions
  * (codegen'd, no UDFs, no shuffle) — at 100 TB these run map-side at
  * scan speed with full column pruning.
  *
  * No counterpart exists in the reference (it has no text ops beyond
  * embedding calls, embedding.py); these extend the engine for the
  * LLM-data-pipeline north star (SURVEY.md §7.6).
  */
object TextFunctions {

  /** Non-empty whitespace-separated token count. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** Count of ASCII punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))

  /** Tokens under a BPE-ish segmentation: word chunks OR single
    * non-word-non-space symbols. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Count of tokens from `words` (lowercased match). */
  def wordListCount(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(split(lower(text), "\\s+"), t => array_contains(arr, t)))
  }

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Canonicalized text for fingerprinting: trim + collapse whitespace +
    * lowercase. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** 128-bit exact-dedup fingerprint (md5 hex of normalized text). */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))
}

/** Appends n_chars/n_words/punct & stopword ratios and a simple
  * length/stopword quality score per document. */
case class TextStatsTransformer(textCol: String, prefix: String = "ts")
    extends GraftTransformer {
  import TextFunctions._
  def outputNames: Seq[String] = Seq("n_chars", "n_words", "punct_ratio",
    "stopword_ratio", "quality").map(s => s"${prefix}_$s")
  def transform(df: DataFrame): DataFrame = {
    val t = col(textCol)
    val words = wordCount(t).cast("double")
    val stop = wordListCount(t, langMarkers.toMap.apply("en")).cast("double")
    val chars = length(t).cast("double")
    df.withColumn(s"${prefix}_n_chars", length(t).cast("long"))
      .withColumn(s"${prefix}_n_words", wordCount(t).cast("long"))
      .withColumn(s"${prefix}_punct_ratio",
        punctCount(t).cast("double") / chars)
      .withColumn(s"${prefix}_stopword_ratio", stop / words)
      // quality: wordy, low-punctuation documents with a plausible
      // natural-language stopword share score high
      .withColumn(s"${prefix}_quality",
        least(words / lit(100.0), lit(1.0)) * (lit(1.0) - punctCount(t)
          .cast("double") / chars) * least(stop / words * 5.0, lit(1.0)))
  }
}

/** Stopword-marker language identification: count marker hits per
  * language, pick the max (ties broken by the fixed language order). */
case class LangIdTransformer(textCol: String, outCol: String = "lang_pred")
    extends GraftTransformer {
  import TextFunctions._
  def outputNames: Seq[String] = Seq(outCol)
  def transform(df: DataFrame): DataFrame = {
    val scores = langMarkers.map { case (l, ws) =>
      l -> wordListCount(col(textCol), ws)
    }
    val m = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === m && m > 0, lit(l)).otherwise(acc)
    }
    // foldRight keeps the first language in langMarkers order winning ties
    df.withColumn(outCol, pick)
  }
}
