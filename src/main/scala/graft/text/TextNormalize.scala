package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

/** Ingest-time text canonicalization (the C4 §2.2 / CCNet cleanup that
  * runs BEFORE any fingerprint): Unicode NFC, control characters to
  * spaces, whitespace runs collapsed, edges trimmed — so byte-level
  * artifacts of the crawl (encoding form, stray control bytes, ragged
  * whitespace) can never split a dedup cluster or skew a length-based
  * quality rule. One scan-speed codegen'd projection; zero joins, zero
  * shuffle.
  *
  * Order matters and is pinned by the spec: NFC first (composition can
  * create or absorb combining marks), then control → space (this also
  * removes the \\x0B/\\x7F characters on which Java and RE2 disagree
  * about \\s membership, which is what keeps the collapse step
  * engine-portable), then the \\s+ collapse, then trim.
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object TextNormalize {

  /** The canonical cleaned form of `text`. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(NfcNormalize(text), "\\p{Cntrl}", " "),
      "\\s+", " "))

  /** (all input columns) + `<out>` = cleaned text, `<out>_n_chars` =
    * its length — the usual ingest projection. */
  def apply(docs: DataFrame, textCol: String,
      out: String = "clean_text"): DataFrame =
    docs.withColumn(out, clean(col(textCol)))
      .withColumn(s"${out}_n_chars", length(col(out)).cast("long"))
}
