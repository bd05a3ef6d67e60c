package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Blocklist screening — the C4 "bad words" filter (Raffel et al. 2020,
  * arXiv:1910.10683 §2.2: pages containing any term from a blocklist
  * are dropped wholesale; the same mechanism serves domain blocklists
  * and policy term filters). Emitted as counts + a keep flag rather
  * than a silent drop, so curation decisions stay attributable.
  *
  * Two delivery paths, matching the repo's literal/data-form pattern:
  * a SMALL pinned list rides the plan as an array literal and the
  * screen is a pure scan-speed projection (zero shuffle, zero joins);
  * a list too large or too dynamic for a literal arrives as a
  * one-column DataFrame and broadcast-joins the exploded tokens —
  * result-identical (pinned by a spec), the per-token count collapsing
  * map-side before the one id-keyed exchange.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object Blocklist {

  /** Blocked-occurrence count for one text column — the literal-path
    * kernel, exposed so row-level callers (e.g. a CDC batch screen that
    * must decide per VERSION, not per id) can filter in place without a
    * join back by id. Null text → 0. */
  def flaggedCol(text: Column, blocklist: Seq[String]): Column = {
    val listed: Column = typedlit(blocklist.toArray)
    coalesce(size(filter(CorpusOps.words(text),
      w => array_contains(listed, w))), lit(0))
  }

  /** Per-row keep flag: true iff no blocked token occurs in `text`. */
  def keepCol(text: Column, blocklist: Seq[String]): Column =
    flaggedCol(text, blocklist) === 0

  /** Literal path: (idCol, n_flagged, keep) — n_flagged counts every
    * OCCURRENCE of a blocked token (not distinct tokens); keep iff
    * none. One projection over the shared tokenization. Null text
    * tokenizes to nothing → n_flagged = 0 / keep = true (the coalesce
    * keeps this path result-identical to [[screenDf]], whose
    * explode_outer + left join yields 0/true for null docs). */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    val flagged = flaggedCol(col(textCol), blocklist)
    docs.select(col(idCol), flagged.cast("long").as("n_flagged"),
      (flagged === 0).as("keep"))
  }

  /** Data-form path: the blocklist as a one-column ("term") frame,
    * broadcast against the exploded tokens; identical output contract.
    * Left join + count keeps clean documents in the output. */
  def screenDf(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
      explode_outer(CorpusOps.words(col(textCol))).as("__tok"))
    val bl = broadcast(blocklist.select(col("term").as("__term"),
      lit(true).as("__hit")))
    toks.join(bl, col("__tok") === col("__term"), "left")
      .groupBy(col(idCol))
      .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("n_flagged"))
      .select(col(idCol), col("n_flagged"),
        (col("n_flagged") === 0).as("keep"))
  }
}
