package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for corpus curation — the scrub pass every
  * production training-data pipeline runs before anything leaves staging
  * (emails, IPv4 addresses, international phone numbers).
  *
  * Pure codegen'd `Column` expressions (`regexp_extract_all` /
  * `regexp_replace`): at 100 TB this runs map-side at scan speed with
  * full column pruning, no shuffle, no UDF. The patterns are written in
  * the RE2-compatible subset (no backreferences, no lookaround) so the
  * DuckDB oracle evaluates the IDENTICAL regexes — detection counts and
  * redacted text verify bit-for-bit across engines.
  *
  * Redaction replaces longest-structured classes first (email before
  * IPv4 before phone) so a class token never partially consumes another
  * class's match. Counts are always computed on the ORIGINAL text.
  *
  * No counterpart in the reference (it has no text ops beyond embedding
  * calls, `embedding.py`); LLM-data-pipeline extension (SURVEY.md §7.6).
  */
object PiiScrub {

  /** (pattern, replacement-token) per PII class, in redaction order. */
  val classes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "[IP]"),
    ("phone", "\\+[0-9]{7,15}\\b", "[PHONE]"))

  /** Matches of one class in `text` (original, pre-redaction). */
  def count(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** `text` with every class replaced by its token, in class order. */
  def redact(text: Column): Column =
    classes.foldLeft(text) { case (t, (_, pat, tok)) =>
      regexp_replace(t, pat, tok)
    }

  /** Appends `n_<class>` counts, a total, and the redacted text. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val counted = classes.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", count(t, pat))
    }
    counted
      .withColumn("n_pii",
        classes.map(c => col(s"n_${c._1}")).reduce(_ + _))
      .withColumn("redacted", redact(t))
  }
}
