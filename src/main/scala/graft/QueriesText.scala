package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{LangIdTransformer, TextFunctions, TextStatsTransformer}
import graft.dedup.Dedup

/** Text-analysis + dedup queries over the `documents` table — the
  * training-data-pipeline extensions (SURVEY.md §7.6). Text stats, token
  * counting, language-ID, fingerprinting and exact-dedup carry full
  * DuckDB oracles; MinHash/SimHash (engine-hash-dependent) are rows-only
  * and covered by DedupSpec property tests instead.
  */
object QueriesText {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> ((s, dir) => {
      TextStatsTransformer("text").transform(docs(s, dir))
        .select(col("doc_id"), col("ts_n_chars"), col("ts_n_words"),
          round(col("ts_punct_ratio"), 6).as("punct_ratio"),
          round(col("ts_stopword_ratio"), 6).as("stopword_ratio"),
          round(col("ts_quality"), 6).as("quality"))
    }),

    "q_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    }),

    "q_lang_id" -> ((s, dir) => {
      LangIdTransformer("text").transform(docs(s, dir))
        .select(col("doc_id"), col("lang_pred"))
    }),

    "q_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
    }),

    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")
        .select(col("fp"), col("keeper"), col("n_dups"))
    }),

    "q_dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        bandWidth = 20, k = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    "q_dedup_minhash" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(docs(s, dir), "doc_id",
        "text", numHashes = 16)
      Dedup.lshCandidates(sigs, "doc_id", numHashes = 16, rowsPerBand = 4)
    }),

    "q_simhash" -> ((s, dir) => {
      Dedup.simHash(docs(s, dir), "doc_id", "text")
    })
  )

  private val enStop = TextFunctions.langMarkers.toMap.apply("en")
    .map(w => s"'$w'").mkString(", ")

  private def markerSql(lang: String): String = {
    val ws = TextFunctions.langMarkers.toMap.apply(lang)
      .map(w => s"'$w'").mkString(", ")
    s"len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x IN ($ws)))"
  }

  private val punctSql =
    """(length(text) - length(regexp_replace(text,
      | '[.,;:!?''"()\[\]{}-]', '', 'g')))""".stripMargin.replace("\n", "")

  private val wordsSql =
    "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"

  val oracleSql: Map[String, String] = Map(
    "q_text_stats" ->
      s"""SELECT doc_id,
         | length(text) AS ts_n_chars,
         | $wordsSql AS ts_n_words,
         | round($punctSql / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
         | round(${markerSql("en")} / CAST($wordsSql AS DOUBLE), 6)
         |   AS stopword_ratio,
         | round(least($wordsSql / 100.0, 1.0)
         |   * (1.0 - $punctSql / CAST(length(text) AS DOUBLE))
         |   * least(${markerSql("en")} / CAST($wordsSql AS DOUBLE) * 5.0, 1.0), 6)
         |   AS quality
         |FROM documents""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))
        |   AS n_tokens
        |FROM documents""".stripMargin,
    "q_lang_id" -> {
      val scores = TextFunctions.langMarkers.map { case (l, _) =>
        s"${markerSql(l)} AS s_$l"
      }.mkString(", ")
      val m = TextFunctions.langMarkers.map(l => s"s_${l._1}")
        .mkString("greatest(", ", ", ")")
      val cases = TextFunctions.langMarkers.map { case (l, _) =>
        s"WHEN s_$l = m AND m > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH scored AS (SELECT doc_id, $scores FROM documents),
         | withm AS (SELECT *, $m AS m FROM scored)
         |SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
         |FROM withm""".stripMargin
    },
    "q_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        | min(doc_id) AS keeper, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id AS id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 2, 1)),
        |      i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), CAST(i AS INTEGER), 3))) AS s
        |  FROM documents)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
        |    AS jaccard
        |FROM sh a JOIN sh b
        |  ON b.id > a.id AND b.id <= a.id + 20
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""".stripMargin
  )
}
