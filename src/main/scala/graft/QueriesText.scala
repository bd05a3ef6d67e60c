package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{LangIdTransformer, TextFunctions, TextStatsTransformer}
import graft.dedup.Dedup

/** Text-analysis + dedup queries over the `documents` table — the
  * training-data-pipeline extensions (SURVEY.md §7.6). ALL queries carry
  * full DuckDB oracles: MinHash/SimHash hashes are md5-derived (identical
  * across engines), so signatures, band buckets and candidate pairs are
  * reproduced bit-for-bit in SQL.
  */
object QueriesText {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  // text kernels are CPU-bound per doc; floor the scan parallelism
  // (one-row-group file = one task otherwise — see ParallelInput)
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.operators.ParallelInput.cpuBound(
      s.read.parquet(s"$dir/documents.parquet"))

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
      Dedup.lshCandidates(sigs, "doc_id", numHashes = 16, rowsPerBand = 4,
        maxBucketSize = 500)
    }),

    "q_simhash" -> ((s, dir) => {
      Dedup.simHash(docs(s, dir), "doc_id", "text")
    }),

    // hamming-radius near-dup pairs over the simhashes (pigeonhole
    // chunk equi-join + exact bit_count check)
    "q_simhash_pairs" -> ((s, dir) => {
      Dedup.simHashNearDups(Dedup.simHash(docs(s, dir), "doc_id", "text"),
        "doc_id", maxHamming = 3, maxBucketSize = 1000)
    }),

    // ingest-time screening: the src16-19 "new batch" checked for
    // near-dups against the already-ingested src0-15 corpus — the daily
    // incremental-dedup shape (never re-joins the corpus with itself)
    "q_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val isDelta = substring(col("source"), 4, 10).cast("int") >= 16
      Dedup.simHashScreen(
        Dedup.simHash(d.where(isDelta), "doc_id", "text"),
        Dedup.simHash(d.where(!isDelta), "doc_id", "text"),
        "doc_id", maxHamming = 3, maxBucketSize = 1000)
    }),

    // PII scrub: the synthetic corpus carries no PII, so the query
    // demonstrates the operator on deterministically derived text
    // (doc_id-seeded emails / IPs / phone numbers appended in-query,
    // identically mirrored in the oracle) — detection counts AND the
    // redacted text verify bit-for-bit. The operator itself is general.
    "q_pii_scrub" -> ((s, dir) => {
      graft.text.PiiScrub.scrub(
        docs(s, dir).withColumn("text", piiText), "text")
        .select(col("doc_id"), col("n_email"), col("n_ipv4"),
          col("n_phone"), col("n_pii"), col("redacted"))
    }),

    // feature-hashing vectorizer (Weinberger et al. 2009): stateless
    // md5 bucket+sign bag-of-words — the no-model text embedding that
    // feeds SemDeDup/ProtoPrune/ANN; one scan-speed projection
    "q_hash_embed" -> ((s, dir) => {
      graft.text.HashingVectorizer.vectorize(docs(s, dir), "text",
        dim = 16)
        .select(col("doc_id") +: (0 until 16).map(b =>
          element_at(col("hvec"), b + 1).as(s"d$b")): _*)
    }),

    // TRAINED quality filter (CCNet arXiv:1911.00359 §4.4 / GPT-3
    // App. A): logistic regression over hashed features, src0 as the
    // trusted positive domain, 3 deterministic full-batch GD steps with
    // round-6 weight snaps — the oracle RETRAINS the identical
    // trajectory unrolled in SQL, then scores every doc with the same
    // final weights (fit + scoring both under the hash gate)
    "q_quality_clf" -> ((s, dir) => {
      graft.text.QualityClassifier.fitScore(docs(s, dir), "text",
        col("source") === "src0", dim = 16, iters = 3, lr = 1.0)
        .select(col("doc_id"), col("y"), col("clf_score"), col("clf_keep"))
    }),

    // URL-level dedup (C4 keep-one-per-URL): the corpus carries no URLs,
    // so the query demonstrates the operator on deterministically derived
    // crawl URLs (content from doc_id % 50 — ~n/50 docs per canonical
    // URL; presentation noise — scheme/host case, www., :443, utm_*
    // params, fragments, trailing slashes — from doc_id, varying WITHIN
    // each group), identically mirrored in the oracle. Canonicalization
    // must unify raw strings exact dedup cannot.
    "q_url_dedup" -> ((s, dir) => {
      graft.text.UrlOps.dedupByUrl(
        docs(s, dir).withColumn("url", crawlUrl), "url", "doc_id")
        .select(col("doc_id"), col("url"), col("canon_url"), col("domain"),
          col("keep"))
    }),

    // snapshot CDC (daily ingest diff): classify every id across two
    // snapshots as added/removed/changed/unchanged by fingerprint under
    // a full outer equi-join. The "new" snapshot is derived
    // deterministically (drops, edits, additions by doc_id moduli),
    // identically mirrored in the oracle.
    "q_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val kept = d.where(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 2, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val added = d.where(col("doc_id") % 19 === 5)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"))
      graft.sources.SnapshotDiff.diff(d, kept.unionByName(added),
        "doc_id", md5(col("text")))
        .select(col("doc_id"), col("status"), col("old_fp"), col("new_fp"))
    }),

    // merge-on-read CDC apply: base snapshot + append-only delta log
    // resolved to the latest row per id at read time (upserts win by
    // version, 'D' tombstones; v2 overrides v1; a v1 edit/delete
    // collision on the same id resolves deterministically by the struct
    // max) — parquet-without-upsert answered the data-lake way
    "q_cdc_resolve" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val v1edit = d.where(col("doc_id") % 13 === 2)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          lit(1L).as("version"), lit("U").as("op"))
      val v1del = d.where(col("doc_id") % 17 === 3)
        .select(col("doc_id"), lit("").as("text"),
          lit(1L).as("version"), lit("D").as("op"))
      val v2edit = d.where(col("doc_id") % 26 === 2)
        .select(col("doc_id"), concat(col("text"), lit(" v3")).as("text"),
          lit(2L).as("version"), lit("U").as("op"))
      val v1add = d.where(col("doc_id") % 19 === 5)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"),
          lit(1L).as("version"), lit("U").as("op"))
      graft.sources.SnapshotDiff.resolveLatest(d,
        v1edit.unionByName(v1del).unionByName(v2edit).unionByName(v1add),
        "doc_id", "version", "op")
        .select(col("doc_id"), col("version"), col("text"))
    }),

    // the DAILY INCREMENTAL-INGEST pipeline composed end to end: CDC
    // diff classifies today's snapshot against the corpus, only the
    // added/changed delta is screened (C4 blocklist — blocked deltas
    // never upsert, so the corpus keeps their last good version),
    // removals tombstone, and the merge-on-read resolve applies it all
    // without rewriting the base. Three round-9 operators + one
    // round-8 screen under ONE chained oracle.
    "q_ingest_pipeline" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val kept = d.where(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 2, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val added = d.where(col("doc_id") % 19 === 5)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"))
      val newSnap = kept.unionByName(added)
      val st = graft.sources.SnapshotDiff.diff(d, newSnap, "doc_id",
        md5(col("text")))
      val delta = st.where(col("status").isin("added", "changed"))
        .select("doc_id").join(newSnap, "doc_id")
      val screened = graft.text.Blocklist
        .screen(delta, "doc_id", "text", Seq("slow", "dup", "lorem"))
        .where(col("keep")).select("doc_id").join(delta, "doc_id")
      val upserts = screened.select(col("doc_id"), col("text"),
        lit(1L).as("version"), lit("U").as("op"))
      val tombstones = st.where(col("status") === "removed")
        .select(col("doc_id"), lit("").as("text"),
          lit(1L).as("version"), lit("D").as("op"))
      graft.sources.SnapshotDiff.resolveLatest(d,
        upserts.unionByName(tombstones), "doc_id", "version", "op")
        .select(col("doc_id"), col("version"), md5(col("text")).as("fp"))
    }),

    // small-files compaction: 64 writer-task shards re-laid-out into
    // range-partitioned, internally sorted files (rows/250 of them) —
    // the daily maintenance job behind every streaming sink; content is
    // layout-invariant (the oracle is the plain table), the file-count
    // and sortedness contracts are spec-pinned.
    "q_compact" -> ((s, dir) => {
      import graft.sources.BucketedLayout
      val small = BucketedLayout.scratchDir("docs_small")
      val outP = BucketedLayout.scratchDir("docs_compact")
      docs(s, dir).select("doc_id", "source", "n_chars")
        .repartition(64).write.mode("overwrite").parquet(small)
      BucketedLayout.compact(s.read.parquet(small), "doc_id", 250L, outP)
    }),

    // count-min sketch (Cormode & Muthukrishnan 2005) as a relational
    // (depth × width) cell frame — bounded-space frequency estimates
    // with the one-sided estimate ≥ exact guarantee, md5-derived rows
    // so the whole sketch verifies bit-for-bit
    "q_count_min" -> ((s, dir) => {
      graft.text.CountMin.estimate(docs(s, dir), "text",
        depth = 4, width = 64)
        .select(col("token"), col("n_exact"), col("cms_est"),
          col("cms_ge_exact"))
    }),

    // ingest canonicalization (NFC + control strip + whitespace
    // collapse): the clean corpus carries no mess, so a deterministic
    // third of docs get a DECOMPOSED é + VT/tab runs and a third a
    // precomposed é (identically mirrored in the oracle) — the NFC
    // kernel, the control pass and the collapse all verify bit-for-bit
    "q_normalize" -> ((s, dir) => {
      graft.text.TextNormalize(
        docs(s, dir).withColumn("text", messyText), "text")
        .select(col("doc_id"), col("clean_text"),
          col("clean_text_n_chars"))
    })
  )

  /** doc_id-seeded messy text ([[messyTextSql]] is the oracle mirror):
    * a third of docs get a decomposed e+COMBINING ACUTE plus control/
    * whitespace runs, a third the precomposed form, a third stay
    * clean. */
  private def messyText: org.apache.spark.sql.Column =
    when(col("doc_id") % 3 === 0,
      concat(col("text"), lit("  cafe\u0301\u000Bdu\tmonde ")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" caf\u00e9 bar  ")))
      .otherwise(col("text"))

  private val messyTextSql: String =
    "CASE WHEN doc_id % 3 = 0 THEN text || '  cafe' || chr(769) || " +
      "chr(11) || 'du' || chr(9) || 'monde ' " +
      "WHEN doc_id % 3 = 1 THEN text || ' caf' || chr(233) || ' bar  ' " +
      "ELSE text END"

  /** doc_id-seeded PII-bearing text (Spark side; [[piiTextSql]] is the
    * oracle mirror): a third of docs get an email, a third an IP + an
    * international phone number, a third stay clean. */
  private def piiText: org.apache.spark.sql.Column =
    when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com now")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" from 10."),
          (col("doc_id") % 256).cast("string"), lit(".0."),
          (col("doc_id") * 7 % 256).cast("string"), lit(" call +1555"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))

  private val piiTextSql: String =
    "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || " +
      "CAST(doc_id AS VARCHAR) || '@example.com now' " +
      "WHEN doc_id % 3 = 1 THEN text || ' from 10.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.0.' || " +
      "CAST(doc_id * 7 % 256 AS VARCHAR) || ' call +1555' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') " +
      "ELSE text END"

  /** doc_id-seeded crawl URL (Spark side; [[crawlUrlSql]] is the oracle
    * mirror). Content — site number, subdomain, TLD, article path, id
    * param — derives from k = doc_id % 50, so ~n/50 docs share each
    * canonical URL; presentation noise derives from doc_id moduli that do
    * NOT divide 50 (3, 4, 6, 7), so it VARIES within every content group
    * and canonicalization has real work to do. */
  private def crawlUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val k = id % 50
    concat(
      when(id % 6 === 0, "HTTPS://").otherwise("https://"),
      when(id % 4 === 0, "www.").when(id % 4 === 1, "WWW.").otherwise(""),
      when(k % 5 === 0, "news.").otherwise(""),
      when(id % 3 === 0, "Site").otherwise("site"),
      (k % 7).cast("string"),
      when(k % 3 === 0, ".com").when(k % 3 === 1, ".co.uk")
        .otherwise(".org"),
      when(id % 7 === 0, ":443").otherwise(""),
      lit("/Articles/"), (k % 11).cast("string"),
      when(k % 3 === 2 && id % 3 === 0, "/").otherwise(""),
      when(k % 3 === 0,
        concat(when(id % 4 < 2, "?utm_source=feed&id=").otherwise("?id="),
          (k % 13).cast("string")))
        .when(k % 3 === 1,
          concat(lit("?id="), (k % 13).cast("string"),
            when(id % 4 === 0, "&utm_campaign=Spring").otherwise("")))
        .otherwise(""),
      when(id % 3 === 0, "#Section2").otherwise(""))
  }

  private val crawlUrlSql: String =
    "CASE WHEN doc_id % 6 = 0 THEN 'HTTPS://' ELSE 'https://' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN 'www.' WHEN doc_id % 4 = 1 " +
      "THEN 'WWW.' ELSE '' END || " +
      "CASE WHEN (doc_id % 50) % 5 = 0 THEN 'news.' ELSE '' END || " +
      "CASE WHEN doc_id % 3 = 0 THEN 'Site' ELSE 'site' END || " +
      "CAST((doc_id % 50) % 7 AS VARCHAR) || " +
      "CASE WHEN (doc_id % 50) % 3 = 0 THEN '.com' " +
      "WHEN (doc_id % 50) % 3 = 1 THEN '.co.uk' ELSE '.org' END || " +
      "CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END || " +
      "'/Articles/' || CAST((doc_id % 50) % 11 AS VARCHAR) || " +
      "CASE WHEN (doc_id % 50) % 3 = 2 AND doc_id % 3 = 0 " +
      "THEN '/' ELSE '' END || " +
      "CASE WHEN (doc_id % 50) % 3 = 0 THEN " +
      "(CASE WHEN doc_id % 4 < 2 THEN '?utm_source=feed&id=' " +
      "ELSE '?id=' END) || CAST((doc_id % 50) % 13 AS VARCHAR) " +
      "WHEN (doc_id % 50) % 3 = 1 THEN " +
      "'?id=' || CAST((doc_id % 50) % 13 AS VARCHAR) || " +
      "(CASE WHEN doc_id % 4 = 0 THEN '&utm_campaign=Spring' " +
      "ELSE '' END) ELSE '' END || " +
      "CASE WHEN doc_id % 3 = 0 THEN '#Section2' ELSE '' END"

  /** md5-digit simhash as a reusable oracle CTE (`sh(doc_id, simhash)`) —
    * mirror of Dedup.simHash. */
  private val simHashCte: String = {
    val digit = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    val bitSums = (for { i <- 1 to 15; b <- 0 until 4 } yield
      s"sum(CASE WHEN ((${digit(i)} >> $b) & 1) = 1 THEN 1 ELSE -1 END)" +
        s" AS b_${i}_$b").mkString(",\n    ")
    val value = (for { i <- 1 to 15; b <- 0 until 4 } yield {
      val k = 4 * (15 - i) + b
      s"(CASE WHEN b_${i}_$b > 0 THEN ${1L << k} ELSE 0 END)"
    }).mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(regexp_extract_all(lower(text),
       |    '[a-z0-9_]+'))) AS m
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM toks GROUP BY doc_id),
       |sh AS (
       |  SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  /** Full simhash near-dup pair query (mirror of Dedup.simHashNearDups
    * with maxHamming = 3): pigeonhole chunks — 60 bits → 4 chunks of 15;
    * the first-matching-chunk rule replaces DISTINCT (all chunks before
    * ci must differ), exactly as the Spark side. Shared with
    * QueriesCorpus.q_dup_clusters, which embeds it as a subquery. */
  private[graft] val simhashPairsSql: String = {
    val banded = (0 until 4).map { ci =>
      s"SELECT doc_id AS id, simhash AS h, $ci AS ci, " +
        s"(simhash >> ${ci * 15}) & ${(1L << 15) - 1} AS cv FROM sh"
    }.mkString("\n  UNION ALL ")
    val firstMatch = (0 until 4).map { ci =>
      val earlier = (0 until ci).map(j =>
        s"((xor(a.h, b.h) >> ${j * 15}) & ${(1L << 15) - 1}) <> 0")
      (s"a.ci = $ci" +: earlier).mkString("(", " AND ", ")")
    }.mkString("(", " OR ", ")")
    s"""$simHashCte,
       |banded AS (
       |  $banded),
       |capped AS (
       |  SELECT * FROM banded
       |  QUALIFY count(*) OVER (PARTITION BY ci, cv) <= 1000)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
       |FROM capped a JOIN capped b ON a.ci = b.ci AND a.cv = b.cv
       |  AND a.id < b.id
       |WHERE bit_count(xor(a.h, b.h)) <= 3
       |  AND $firstMatch""".stripMargin
  }

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

  /** q_quality_clf oracle: the full fixed-iteration logistic-GD
    * trajectory unrolled — hashed features (the q_hash_embed mirror) +
    * intercept, per-round margin in the VecDot index order, avg
    * gradient, round-6 weight snap (engine-stable state, as the
    * kmeans/umap/bpe-train oracles), then final scoring with the
    * retrained weights. Iteration CTEs are MATERIALIZED (each is
    * referenced twice; DuckDB inlines CTEs by default). */
  private def qualityClfSql(dim: Int, iters: Int, lr: Double): String = {
    val b = "(" + Dedup.md5ChunkSql("md5(t)", 1, 13) + s") % $dim"
    val s14 = "((" + Dedup.md5ChunkSql("md5(t)", 14, 1) + ") % 2) * 2 - 1"
    val dims = (0 until dim).map(d =>
      s"coalesce(list_sum(list_transform(l, t -> CASE WHEN $b = $d " +
        s"THEN CAST($s14 AS DOUBLE) ELSE 0.0 END)), 0.0) AS d$d")
      .mkString(",\n    ")
    val margin = ((0 until dim).map(j => s"d$j * w$j") :+
      s"1.0 * w$dim").mkString(" + ")
    val gs = ((0 until dim).map(j => s"avg(d$j * (p - y)) AS g$j") :+
      s"avg(1.0 * (p - y)) AS g$dim").mkString(",\n    ")
    val wUpd = (0 to dim).map(j => s"round(w$j - $lr * g$j, 6) AS w$j")
      .mkString(",\n    ")
    val w0 = (0 to dim).map(j => s"0.0 AS w$j").mkString(", ")
    val iterCtes = (0 until iters).map { t =>
      s"""m$t AS MATERIALIZED (
         |  SELECT f.*, 1.0 / (1.0 + exp(-($margin))) AS p
         |  FROM f, w$t),
         |g$t AS MATERIALIZED (
         |  SELECT $gs
         |  FROM m$t),
         |w${t + 1} AS MATERIALIZED (
         |  SELECT $wUpd
         |  FROM g$t, w$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT doc_id, source, regexp_extract_all(lower(text),
       |    '[a-z0-9_]+') AS l FROM documents),
       |f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y,
       |    $dims
       |  FROM w),
       |w0 AS (SELECT $w0),
       |$iterCtes
       |SELECT f.doc_id, f.y,
       |  round(1.0 / (1.0 + exp(-($margin))), 6) AS clf_score,
       |  round(1.0 / (1.0 + exp(-($margin))), 6) >= 0.5 AS clf_keep
       |FROM f, w$iters""".stripMargin
  }

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
    "q_dedup_minhash" -> {
      val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      val sigCols = (0 until 16).map(i =>
        s"min(h1 + $i * h2) AS h$i").mkString(",\n    ")
      val bandKeys = (0 until 4).map { b =>
        val sigs = (0 until 4).map(r => s"h${b * 4 + r}").mkString(", ")
        s"md5(concat_ws(',', $b, $sigs))"
      }.mkString(",\n    ")
      s"""WITH nrm AS (
         |  SELECT doc_id AS id, $normSql AS t FROM documents),
         |sh AS (
         |  SELECT id, unnest(list_distinct(list_transform(
         |    generate_series(1, greatest(length(t) - 2, 1)),
         |    i -> substr(t, CAST(i AS INT), 3)))) AS s
         |  FROM nrm),
         |hs AS (
         |  SELECT id,
         |    ${Dedup.md5ChunkSql("md5(s)", 1, 10)} AS h1,
         |    ${Dedup.md5ChunkSql("md5(s)", 11, 10)} AS h2
         |  FROM sh),
         |sig AS (
         |  SELECT id,
         |    $sigCols
         |  FROM hs GROUP BY id),
         |bands AS (
         |  SELECT id, unnest([
         |    $bandKeys
         |  ]) AS bucket FROM sig),
         |capped AS (
         |  SELECT * FROM bands
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= 500)
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |FROM capped a JOIN capped b
         |  ON a.bucket = b.bucket AND a.id < b.id""".stripMargin
    },

    "q_simhash" ->
      s"""$simHashCte
         |SELECT doc_id, simhash FROM sh""".stripMargin,

    "q_simhash_pairs" -> simhashPairsSql,

    "q_dedup_incremental" -> {
      def bandedSql(src: String): String = (0 until 4).map { ci =>
        s"SELECT doc_id AS id, simhash AS h, $ci AS ci, " +
          s"(simhash >> ${ci * 15}) & ${(1L << 15) - 1} AS cv FROM $src"
      }.mkString("\n  UNION ALL ")
      s"""$simHashCte,
         |sp AS (
         |  SELECT sh.doc_id, sh.simhash,
         |    CAST(substr(d.source, 4) AS INT) >= 16 AS is_delta
         |  FROM sh JOIN documents d USING (doc_id)),
         |shd AS (SELECT doc_id, simhash FROM sp WHERE is_delta),
         |she AS (SELECT doc_id, simhash FROM sp WHERE NOT is_delta),
         |bd AS (
         |  ${bandedSql("shd")}),
         |be AS (
         |  ${bandedSql("she")}),
         |cd AS (SELECT * FROM bd
         |  QUALIFY count(*) OVER (PARTITION BY ci, cv) <= 1000),
         |ce AS (SELECT * FROM be
         |  QUALIFY count(*) OVER (PARTITION BY ci, cv) <= 1000),
         |cand AS (
         |  SELECT a.id, CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hm,
         |    b.id AS mid
         |  FROM cd a JOIN ce b ON a.ci = b.ci AND a.cv = b.cv
         |  WHERE bit_count(xor(a.h, b.h)) <= 3)
         |SELECT id AS doc_id, hm AS hamming, mid AS matched_id FROM cand
         |QUALIFY row_number() OVER (PARTITION BY id ORDER BY hm, mid) = 1""".stripMargin
    },

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
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""".stripMargin,

    "q_pii_scrub" -> {
      // identical RE2-subset regexes as the Spark side, from the same
      // constants; counts on the original, redaction chained in order
      val Seq(em, ip, ph) = graft.text.PiiScrub.classes.map(_._2)
      val red = graft.text.PiiScrub.classes.foldLeft("t") {
        case (acc, (_, pat, tok)) =>
          s"regexp_replace($acc, '$pat', '$tok', 'g')"
      }
      s"""WITH p AS (SELECT doc_id, $piiTextSql AS t FROM documents)
         |SELECT doc_id,
         | len(regexp_extract_all(t, '$em')) AS n_email,
         | len(regexp_extract_all(t, '$ip')) AS n_ipv4,
         | len(regexp_extract_all(t, '$ph')) AS n_phone,
         | len(regexp_extract_all(t, '$em')) + len(regexp_extract_all(t, '$ip'))
         |   + len(regexp_extract_all(t, '$ph')) AS n_pii,
         | $red AS redacted
         |FROM p""".stripMargin
    },

    "q_quality_clf" -> qualityClfSql(dim = 16, iters = 3, lr = 1.0),

    "q_snapshot_diff" ->
      """WITH oldt AS (SELECT doc_id, md5(text) AS old_fp FROM documents),
        |newt AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 13 = 2
        |    THEN text || ' v2' ELSE text END) AS new_fp
        |  FROM documents WHERE doc_id % 17 <> 3
        |  UNION ALL
        |  SELECT -doc_id - 1,
        |    md5('new doc ' || CAST(doc_id AS VARCHAR))
        |  FROM documents WHERE doc_id % 19 = 5)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.old_fp IS NULL THEN 'added'
        |       WHEN n.new_fp IS NULL THEN 'removed'
        |       WHEN o.old_fp = n.new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.old_fp, n.new_fp
        |FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id"""
        .stripMargin,

    "q_compact" ->
      "SELECT doc_id, source, n_chars FROM documents",

    "q_ingest_pipeline" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |newt AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 2
        |    THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3
        |  UNION ALL
        |  SELECT -doc_id - 1, 'new doc ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 19 = 5),
        |st AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
        |         ELSE 'changed' END AS status,
        |    n.text AS new_text
        |  FROM base o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id),
        |delta AS (SELECT doc_id, new_text AS text FROM st
        |  WHERE status IN ('added', 'changed')),
        |screened AS (SELECT doc_id, text FROM delta
        |  WHERE len(list_filter(regexp_extract_all(lower(text),
        |    '[a-z0-9_]+'), x -> list_contains(['slow', 'dup', 'lorem'],
        |    x))) = 0),
        |all_rows AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS version, 'U' AS op, text
        |  FROM base
        |  UNION ALL SELECT doc_id, 1, 'U', text FROM screened
        |  UNION ALL SELECT doc_id, 1, 'D', '' FROM st
        |    WHERE status = 'removed'),
        |latest AS (
        |  SELECT doc_id, version, op, text FROM all_rows
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY version DESC, op DESC, text DESC) = 1)
        |SELECT doc_id, version, md5(text) AS fp
        |FROM latest WHERE op <> 'D'""".stripMargin,

    "q_cdc_resolve" ->
      """WITH all_rows AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS version, 'U' AS op, text
        |  FROM documents
        |  UNION ALL SELECT doc_id, 1, 'U', text || ' v2'
        |    FROM documents WHERE doc_id % 13 = 2
        |  UNION ALL SELECT doc_id, 1, 'D', ''
        |    FROM documents WHERE doc_id % 17 = 3
        |  UNION ALL SELECT doc_id, 2, 'U', text || ' v3'
        |    FROM documents WHERE doc_id % 26 = 2
        |  UNION ALL SELECT -doc_id - 1, 1, 'U',
        |    'new doc ' || CAST(doc_id AS VARCHAR)
        |    FROM documents WHERE doc_id % 19 = 5),
        |latest AS (
        |  SELECT doc_id, version, op, text FROM all_rows
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY version DESC, op DESC, text DESC) = 1)
        |SELECT doc_id, version, text FROM latest WHERE op <> 'D'"""
        .stripMargin,

    "q_count_min" -> {
      import graft.text.CountMin
      val cells = (d: String) => (0 until 4).map(i =>
        s"SELECT token, $i AS d, ${CountMin.bucketSql("token", i, 64)} " +
          s"AS b FROM $d").mkString("\n  UNION ALL ")
      s"""WITH w AS (SELECT regexp_extract_all(lower(text),
         |    '[a-z0-9_]+') AS l FROM documents),
         |toks AS (SELECT unnest(l) AS token FROM w),
         |cells AS (${cells("toks")}),
         |sk AS (SELECT d, b, count(*) AS cnt FROM cells GROUP BY d, b),
         |exact AS (SELECT token, count(*) AS n_exact FROM toks
         |  GROUP BY token),
         |probes AS (${cells("exact")}),
         |est AS (SELECT p.token, min(s.cnt) AS cms_est
         |  FROM probes p JOIN sk s ON p.d = s.d AND p.b = s.b
         |  GROUP BY p.token)
         |SELECT e.token, e.n_exact, est.cms_est,
         |  est.cms_est >= e.n_exact AS cms_ge_exact
         |FROM exact e JOIN est ON e.token = est.token""".stripMargin
    },

    "q_url_dedup" -> {
      // identical RE2-subset patterns as the Spark side, from the same
      // constants (graft.text.UrlOps) — the two engines cannot drift
      import graft.text.UrlOps._
      val noFrag = s"regexp_replace(url, '$fragPat', '', 'g')"
      val host = s"regexp_replace(regexp_replace(lower(regexp_extract(" +
        s"url, '$hostPat', 1)), '$portPat', '', 'g'), '$wwwPat', '', 'g')"
      val rest = s"regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace($noFrag, '$schemeHostPat', '', 'g'), " +
        s"'$utmPat', '', 'g'), '$danglingPat', '', 'g'), " +
        s"'$trailSlashPat', '', 'g')"
      s"""WITH u AS (SELECT doc_id, $crawlUrlSql AS url FROM documents),
         |c AS (SELECT doc_id, url,
         |  CASE WHEN regexp_matches(url, '$schemeHostPat')
         |    THEN lower(regexp_extract($noFrag, '$schemePat', 1))
         |      || '://' || $host || $rest
         |    ELSE url END AS canon_url,
         |  $host AS h
         |FROM u)
         |SELECT doc_id, url, canon_url,
         |  CASE WHEN regexp_matches(h, '$secondLevelSuffixPat')
         |    THEN regexp_extract(h, '$regDom3Pat', 1)
         |    ELSE regexp_extract(h, '$regDom2Pat', 1) END AS domain,
         |  doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
         |FROM c""".stripMargin
    },

    "q_hash_embed" -> {
      val b = "(" + Dedup.md5ChunkSql("md5(t)", 1, 13) + ") % 16"
      val s14 = "((" + Dedup.md5ChunkSql("md5(t)", 14, 1) + ") % 2) * 2 - 1"
      val dims = (0 until 16).map(d =>
        s"coalesce(list_sum(list_transform(l, t -> CASE WHEN $b = $d " +
          s"THEN CAST($s14 AS DOUBLE) ELSE 0.0 END)), 0.0) AS d$d")
        .mkString(",\n  ")
      s"""WITH w AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+')
         |    AS l FROM documents)
         |SELECT doc_id,
         |  $dims
         |FROM w""".stripMargin
    },

    "q_normalize" ->
      s"""WITH m AS (SELECT doc_id, $messyTextSql AS t FROM documents),
         |c AS (SELECT doc_id,
         |  trim(regexp_replace(regexp_replace(nfc_normalize(t),
         |    '[[:cntrl:]]', ' ', 'g'), '\\s+', ' ', 'g')) AS clean_text
         |  FROM m)
         |SELECT doc_id, clean_text,
         |  CAST(length(clean_text) AS BIGINT) AS clean_text_n_chars
         |FROM c""".stripMargin
  )
}
