package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization, registered-domain extraction, and URL-level
  * deduplication — the web-crawl ingest steps every production corpus
  * runs before content dedup (C4 keeps one page per URL; RefinedWeb §3.1
  * filters and caps by registered domain).
  *
  * Everything is a pure codegen'd `Column` expression over RE2-compatible
  * regexes (no backreferences / lookaround), so the DuckDB oracle
  * evaluates IDENTICAL patterns and the canonical strings verify
  * bit-for-bit. At 100 TB canonicalize/domain run map-side at scan speed;
  * the dedup itself is one map-side-combined groupBy on the canonical
  * string plus one equi-join back (the exactGroups shape — never a window
  * over the corpus).
  *
  * Canonical form (the usual crawl normalization):
  *   - drop the fragment (`#…` is client-side only)
  *   - lowercase scheme and host (case-insensitive per RFC 3986)
  *   - strip the https default port `:443`
  *   - strip one leading `www.`
  *   - drop `utm_*` tracking parameters (and any dangling `?`/`&`)
  *   - strip trailing slashes from the path end
  * Path/query case is PRESERVED (it is significant server-side).
  *
  * No counterpart in the reference (it has no web-ingest surface);
  * LLM-data-pipeline extension (SURVEY.md §7.6).
  */
object UrlOps {

  // Shared pattern constants — the Spark side and the SQL mirror both
  // fold over THESE strings, so the two engines cannot drift.
  val fragPat = "#.*$"
  val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val hostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val schemeHostPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
  val portPat = ":443$"
  val wwwPat = "^www\\."
  val utmPat = "utm_[a-z]+=[^&#]*&?"
  val danglingPat = "[?&]$"
  val trailSlashPat = "/+$"

  /** Country-code second-level suffixes where the registered domain is
    * the last THREE labels (a bounded public-suffix subset; the full PSL
    * would ship as a broadcast lookup frame in the same shape). */
  val secondLevelSuffixPat = "\\.(co\\.uk|org\\.uk|com\\.au|co\\.jp|ac\\.uk)$"
  val regDom3Pat = "([^.]+\\.[^.]+\\.[^.]+)$"
  val regDom2Pat = "([^.]+\\.[^.]+)$"

  /** Canonical host of `url`: lowercased, default port and one leading
    * `www.` stripped. */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, hostPat, 1)),
        portPat, ""),
      wwwPat, "")

  /** The full canonical URL (see class doc for the normalization).
    * Scheme-less or otherwise malformed inputs (no `scheme://host`
    * prefix) pass through UNCHANGED — extracting an empty scheme/host
    * would emit a `'://'`-prefixed string and silently unify every
    * malformed URL whose remainder coincides under [[dedupByUrl]]. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, fragPat, "")
    val scheme = lower(regexp_extract(noFrag, schemePat, 1))
    val host = canonicalHost(noFrag)
    val rest = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(noFrag, schemeHostPat, ""),
          utmPat, ""),
        danglingPat, ""),
      trailSlashPat, "")
    when(url.rlike(schemeHostPat), concat(scheme, lit("://"), host, rest))
      .otherwise(url)
  }

  /** Registered domain of a CANONICAL host: last two labels, or last
    * three under a second-level public suffix. */
  def registeredDomain(host: Column): Column =
    when(host.rlike(secondLevelSuffixPat),
      regexp_extract(host, regDom3Pat, 1))
      .otherwise(regexp_extract(host, regDom2Pat, 1))

  /** Appends `canon_url`, `domain`, and `keep` (true iff this row has the
    * smallest `idCol` among rows sharing a canonical URL — the
    * deterministic C4 keep-one-per-URL rule). One map-side-combined
    * groupBy + one equi-join; no window. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val withCanon = df
      .withColumn("canon_url", canonicalize(col(urlCol)))
      .withColumn("domain", registeredDomain(canonicalHost(col(urlCol))))
    val keepers = withCanon.groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("_keeper"))
    withCanon.join(keepers, "canon_url")
      .withColumn("keep", col(idCol) === col("_keeper"))
      .drop("_keeper")
  }
}
