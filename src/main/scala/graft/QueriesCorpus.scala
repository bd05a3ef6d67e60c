package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{Blocklist, Bm25, Bpe, CorpusOps, CorpusSplit,
  Decontaminate, DomainCap, Dsir, DupSpans, HeavyHitters, NgramLm,
  QualityFilterTransformer, RepetitionTransformer, SegmentDedup}
import graft.dedup.{Dedup, DupClusters}

/** Corpus-curation queries over the `documents` table: quality
  * filtering, repetition, BM25, decontamination, deterministic splits,
  * sequence packing, mixture weights, duplicate clustering. Every query
  * carries a value-exact DuckDB oracle; all per-doc statistics derive
  * from integer token counts, so the only cross-engine surface is
  * libm (ln/pow) behind a round(6).
  */
object QueriesCorpus {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  // tokenizer-heavy corpus kernels: same parallelism floor as
  // QueriesText.docs (one-row-group file = one task otherwise)
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.operators.ParallelInput.cpuBound(
      s.read.parquet(s"$dir/documents.parquet"))

  private val bm25Terms = Seq("spark", "join", "query")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality" -> ((s, dir) => {
      QualityFilterTransformer("text").transform(docs(s, dir))
        .select(col("doc_id"), col("qf_n_words").as("n_words"),
          round(col("qf_mean_word_len"), 6).as("mean_word_len"),
          round(col("qf_ttr"), 6).as("ttr"),
          round(col("qf_top_word_frac"), 6).as("top_word_frac"),
          col("qf_keep").as("keep"))
    }),

    "q_repetition" -> ((s, dir) => {
      RepetitionTransformer("text").transform(docs(s, dir))
        .select(col("doc_id"),
          round(col("rep_dup2_frac"), 6).as("dup2_frac"),
          round(col("rep_dup3_frac"), 6).as("dup3_frac"))
    }),

    "q_bm25" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Bm25.score(docs(s, dir), "doc_id", "text", bm25Terms)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .where(col("rank") <= 50)
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"), col("rank"))
    }),

    "q_decontaminate" -> ((s, dir) => {
      Decontaminate.overlap(docs(s, dir), "doc_id", "text",
        col("doc_id") % 97 === 0, shingleSize = 4)
        .select(col("doc_id"), col("n_shared"))
    }),

    // decontamination when the reference set cannot broadcast: 2 MiB
    // hash-bitset prefilter + shuffle-hash exact confirm. Identical
    // results to q_decontaminate (shared oracle), scale-path plan.
    "q_decontaminate_scale" -> ((s, dir) => {
      Decontaminate.overlapLargeRef(docs(s, dir), "doc_id", "text",
        col("doc_id") % 97 === 0, shingleSize = 4)
        .select(col("doc_id"), col("n_shared"))
    }),

    // Lee et al. 2022 duplicated-span stats: positions whose word 8-gram
    // recurs anywhere in the corpus, plus per-doc token coverage.
    "q_dup_spans" -> ((s, dir) => {
      DupSpans.spanStats(docs(s, dir), "doc_id", "text", k = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          col("n_dup_spans"), col("n_dup_tokens"),
          round(col("dup_frac"), 6).as("dup_frac"))
    }),

    // per-source unigram KL vs the corpus blend — the domain-shift
    // report before/after mixture reweighting
    "q_source_kl" -> ((s, dir) => {
      graft.text.SourceKl.unigramKl(docs(s, dir), "source", "text")
        .select(col("source"), col("n_tokens"), col("n_distinct"),
          round(col("kl"), 6).as("kl"))
    }),

    // stratified rate sampling (the step that APPLIES a quality/source
    // stratification): keep iff the doc's md5-uniform draw falls under
    // its stratum's rate — deterministic, growth-stable, pure scan
    "q_rate_sample" -> ((s, dir) => {
      CorpusSplit.sampleByRate(docs(s, dir), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.1)
        .select(col("doc_id"), col("source"))
    }),

    // deterministic global shuffle + sharding for training order:
    // shard = md5 bucket, position = md5 rank within the shard — the
    // interleave step producing the streamable shuffled dataset
    "q_interleave" -> ((s, dir) => {
      CorpusSplit.interleave(docs(s, dir), "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"), col("position"))
    }),

    // corpus-wide repeated-segment excision (CCNet paragraph dedup /
    // RefinedWeb line-wise corrections): any 5-word segment whose exact
    // fingerprint recurs corpus-wide is cut from every doc
    "q_seg_dedup" -> ((s, dir) => {
      SegmentDedup.dedup(docs(s, dir), "doc_id", "text",
        segWords = 5, maxOccurrences = 1)
        .select(col("doc_id"), col("n_segments"), col("n_dropped"),
          col("clean_text"))
    }),

    // C4-style blocklist screen (literal path): occurrence counts of
    // pinned blocked terms + the keep flag, one scan-speed projection
    "q_blocklist" -> ((s, dir) => {
      Blocklist.screen(docs(s, dir), "doc_id", "text",
        Seq("slow", "dup", "lorem"))
        .select(col("doc_id"), col("n_flagged"), col("keep"))
    }),

    // true merges-table BPE token counting (vs the regex approximation
    // in q_token_count): the packing/mixture gate count, as a pure
    // chain of codegen'd regex merges against the pinned merges table
    "q_token_bpe" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        size(CorpusOps.words(col("text"))).cast("long").as("n_words"),
        Bpe.tokenCount(col("text"), Bpe.pinnedMerges).as("n_tokens_bpe"))
    }),

    // END-TO-END BPE trainer under the driver gate: learn 24 merges on
    // the corpus with the distributed trainer (deterministic — integer
    // pair counts, lexicographic tie-breaks, no floats anywhere), then
    // tokenize the whole corpus with the learned table. The oracle
    // RECOMPUTES all 24 training rounds unrolled in SQL, so trainer AND
    // tokenizer verify cross-engine (q_token_bpe covers the pinned-table
    // tokenizer; this closes the trainer↔tokenizer loop).
    "q_bpe_train" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Bpe.learnMerges(d, "doc_id", "text", 24)
      val mdf = s.createDataFrame(
        merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) })
        .toDF("merge_idx", "a", "b")
      mdf.crossJoin(d.agg(
        sum(Bpe.tokenCount(col("text"), merges)).as("corpus_tokens")))
    }),

    // merged duplicated-token intervals per doc (Lee et al.'s excision
    // artifact): island detection over the duplicated k-gram positions
    "q_dup_span_ranges" -> ((s, dir) => {
      DupSpans.spanRanges(docs(s, dir), "doc_id", "text", k = 8)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"))
    }),

    "q_hash_split" -> ((s, dir) => {
      val d = docs(s, dir)
      d.select(col("source"), CorpusSplit.hashSplit(col("doc_id")).as("split"),
          size(CorpusOps.words(col("text"))).as("n_tok"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    }),

    "q_seq_pack" -> ((s, dir) => {
      CorpusSplit.pack(docs(s, dir), "doc_id", "source",
        size(CorpusOps.words(col("text"))).cast("long"), ctxTokens = 512)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
    }),

    // first-fit-decreasing packing (Johnson 1973): tighter bins than
    // q_seq_pack's running-sum cut; the per-shard sequential fold is ONE
    // aggregate() expression whose recurrence the oracle replays with
    // DuckDB's list_reduce (first element seeds the accumulator on both
    // engines, slice-surgery bin updates — no indexed lambdas)
    "q_pack_ffd" -> ((s, dir) => {
      CorpusSplit.packFfd(docs(s, dir), "doc_id", "source",
        size(CorpusOps.words(col("text"))).cast("long"), ctxTokens = 128)
        .select(col("source"), col("doc_id"), col("n_tokens"), col("bin"))
    }),

    "q_mixture" -> ((s, dir) => {
      CorpusSplit.mixtureWeights(docs(s, dir), "source",
        size(CorpusOps.words(col("text"))).cast("long"), alpha = 0.5)
        .select(col("source"), col("n_docs"),
          round(col("token_share"), 6).as("token_share"),
          round(col("weight"), 6).as("weight"))
    }),

    // UniMax budget allocation (Chung et al. 2023): cap 4 epochs per
    // source, budget 3.7× the corpus (so the small-source prefix caps and
    // the rest split the remainder uniformly — both regimes exercised).
    // The corpus-total scalar is the one driver-side collect (a
    // single-row aggregate); everything else is two window passes over
    // the per-SOURCE frame.
    "q_unimax" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = size(CorpusOps.words(col("text"))).cast("long")
      val total = d.agg(sum(tok)).first().getLong(0)
      CorpusSplit.unimaxAllocation(d, "source", tok,
        budget = 3.7 * total, maxEpochs = 4.0)
        .select(col("source"), col("n_tokens"),
          round(col("alloc_tokens"), 2).as("alloc_tokens"),
          round(col("epochs"), 6).as("epochs"), col("capped"))
    }),

    "q_vocab" -> ((s, dir) => {
      CorpusSplit.topVocab(docs(s, dir), "doc_id", "text", k = 100)
        .select(col("rank"), col("token"), col("n_occurrences"),
          col("n_docs"))
    }),

    "q_sample" -> ((s, dir) => {
      CorpusSplit.sampleBySource(docs(s, dir), "doc_id", "source", n = 5)
        .select(col("doc_id"), col("source"))
    }),

    // Efraimidis–Spirakis weighted sampling: keep the 10 docs per source
    // with the largest ln(u)/n_chars keys — the order-equivalent log
    // form of u^(1/n_chars) (longer docs more likely), resolution-stable
    // at large weights — deterministic md5-uniform u, round-6 keys,
    // bounded partial top-k aggregate (topk_by), never a per-source
    // window over the corpus
    "q_weighted_sample" -> ((s, dir) => {
      CorpusSplit.weightedSample(docs(s, dir), "doc_id", "source",
        col("n_chars").cast("double"), k = 10)
        .select(col("source"), col("rank"), col("doc_id"), col("key"))
    }),

    "q_chunk" -> ((s, dir) => {
      CorpusSplit.chunk(docs(s, dir), "doc_id", "text",
        chunkSize = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          col("chunk_text"))
    }),

    "q_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.simHashNearDups(
        Dedup.simHash(docs(s, dir), "doc_id", "text"),
        "doc_id", maxHamming = 3, maxBucketSize = 1000)
      DupClusters.minLabelClusters(pairs, "id_a", "id_b", iters = 4)
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // Stupid-backoff bigram LM scoring: counts from the train split,
    // every doc scored, so val/test docs exercise the backoff path.
    "q_ngram_lm" -> ((s, dir) => {
      NgramLm.scoreStupidBackoff(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
    }),

    // Exact bigram heavy hitters: Misra-Gries candidate sketch + exact
    // confirm — result equals brute-force groupBy-count thresholding
    // (which is precisely what the oracle runs) with a vocabulary-free
    // shuffle bound.
    "q_heavy_hitters" -> ((s, dir) => {
      HeavyHitters.exact(docs(s, dir),
        CorpusOps.wordNgrams(CorpusOps.words(col("text")), 2),
        theta = 0.001)
        .select(col("token"), col("n_occurrences"),
          round(col("frac"), 6).as("frac"))
    }),

    // Exact components to CONVERGENCE (large-star/small-star) over the
    // same near-dup pair list — the scale path past q_dup_clusters'
    // fixed 4-round budget; its oracle is true reachability, not an
    // unrolled round count.
    "q_cc_components" -> ((s, dir) => {
      val pairs = Dedup.simHashNearDups(
        Dedup.simHash(docs(s, dir), "doc_id", "text"),
        "doc_id", maxHamming = 3, maxBucketSize = 1000)
      DupClusters.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // Canonical-representative selection per duplicate cluster: the
    // keep/drop decision after clustering (keep the longest member,
    // ties to the smallest id) — champion election is a map-side
    // combined groupBy, never a per-cluster window.
    "q_canonical" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.simHashNearDups(
        Dedup.simHash(d, "doc_id", "text"),
        "doc_id", maxHamming = 3, maxBucketSize = 1000)
      val comps = DupClusters.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      DupClusters.canonicalPerCluster(comps, "doc_id", "cluster",
        d, "n_chars")
        .select(col("doc_id"), col("cluster"), col("n_chars"),
          col("is_canonical"))
    }),

    // Gopher quality-rule battery (Rae et al. 2021 Table A1): five
    // independent boolean rules + keep = AND, all one codegen'd
    // projection over a single tokenization.
    "q_gopher" -> ((s, dir) => {
      graft.text.GopherRules.battery(docs(s, dir), "text")
        .select(col("doc_id"), col("n_words"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          round(col("alpha_frac"), 6).as("alpha_frac"),
          col("n_stopwords"),
          col("r_word_count"), col("r_mean_word_len"),
          col("r_symbol_ratio"), col("r_alpha_frac"), col("r_stopwords"),
          col("keep"))
    }),

    // CCNet head/middle/tail perplexity buckets over the bigram-LM
    // scores: cut points are ONE tiny exact-percentile aggregate
    // broadcast back as scalars — no global sort, no window.
    "q_lm_buckets" -> ((s, dir) => {
      graft.text.LmBuckets.headMiddleTail(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"),
          col("bucket"))
    }),

    // per-domain cap (RefinedWeb §3.1): keep each source's 10 longest
    // docs via ONE bounded partial top-k aggregate — the exchange
    // carries ≤ k rows per (task, source), never the corpus; the
    // oracle's row_number window is the shape this operator replaces
    "q_domain_cap" -> ((s, dir) => {
      DomainCap.cap(docs(s, dir), "source", col("n_chars"), col("doc_id"),
        k = 10)
        .select(col("source"), col("id").as("doc_id"),
          col("score").cast("long").as("n_chars"), col("rk"))
    }),

    // DSIR importance resampling (Xie et al. 2023): hashed unigram +
    // bigram bag models (256 buckets, add-1), target = src0, keep the
    // Gumbel-top-25% by log importance weight — the principled "make
    // the crawl look like the quality domain" selection step
    "q_dsir" -> ((s, dir) => {
      Dsir.resample(docs(s, dir), "doc_id", "text",
        col("source") === "src0", keepFrac = 0.25)
        .select(col("doc_id"), col("n_feats"),
          round(col("log_w"), 6).as("log_w"), col("key"), col("keep"))
    }),

    // the Lee et al. excision applied: tokens under any merged
    // duplicated interval cut, remainder reassembled — one scan-speed
    // filter after the spanRanges machinery, no second corpus shuffle
    "q_dup_excise" -> ((s, dir) => {
      DupSpans.excise(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          col("clean_text"))
    }),

    // the END-TO-END curation chain in ONE engine query — canonicalize
    // → blocklist screen → per-source rate downsampling → global
    // shuffle + sharding: four already-oracled operators COMPOSED, the
    // shape a real ingest job runs; the only shuffle in the whole plan
    // is interleave's shard exchange (everything upstream is
    // scan-speed), and the oracle chains the same four mirrors
    "q_pipeline" -> ((s, dir) => {
      val clean = graft.text.TextNormalize(docs(s, dir), "text")
        .select(col("doc_id"), col("source"), col("clean_text"))
      val kept = clean.join(
        Blocklist.screen(clean, "doc_id", "clean_text",
          Seq("slow", "dup", "lorem"))
          .where(col("keep")).select("doc_id"),
        Seq("doc_id"))
      val sampled = CorpusSplit.sampleByRate(kept, "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.75)
      CorpusSplit.interleave(sampled, "doc_id", nShards = 4)
        .select(col("doc_id"), col("shard"), col("position"))
    }),

    // PMI collocation mining (phrase detection before vocab building):
    // two count tables + candidate-side joins, top-k via the
    // LimitPushDownThroughWindow TakeOrdered shape
    "q_collocations" -> ((s, dir) => {
      graft.text.Collocations.topPmi(docs(s, dir), "text",
        minCount = 20, k = 50)
        .select(col("rank"), col("bigram"), col("c12"), col("c1"),
          col("c2"), round(col("pmi"), 6).as("pmi"))
    })
  )

  /** Shared tokenization CTE (mirror of CorpusOps.words). */
  private val wCte =
    "SELECT doc_id, source, regexp_extract_all(lower(text), " +
      "'[a-z0-9_]+') AS l FROM documents"

  /** q_bpe_train oracle: the ENTIRE trainer loop unrolled — per round, a
    * pair-count aggregate over the evolving (spelled word, count)
    * vocabulary, the (cnt DESC, a, b) argmax with the ≥2 support floor,
    * and the winning merge applied (one anchored regex replace) to both
    * the vocabulary and the corpus; finally the merges table
    * cross-joined with the corpus-wide BPE token total under the learned
    * table. All counts are integers and the tie-break is lexicographic,
    * so the trainer trajectory is exactly reproducible cross-engine
    * (mirror of [[graft.text.Bpe.learnMerges]] round for round; an empty
    * m-round leaves every later round unchanged = the early-stop). */
  private def bpeTrainSql(rounds: Int): String = {
    val iterCtes = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT t[i] AS a, t[i + 1] AS b, sum(n) AS cnt FROM (
         |    SELECT n, t, unnest(range(1, len(t))) AS i
         |    FROM (SELECT n, list_filter(string_split(s, ' '),
         |      x -> x <> '') AS t FROM v$r) WHERE len(t) >= 2)
         |  GROUP BY 1, 2 HAVING sum(n) >= 2),
         |m$r AS MATERIALIZED (SELECT ${r + 1} AS merge_idx, a, b FROM p$r
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT CASE WHEN m.a IS NULL THEN v.s ELSE
         |    regexp_replace(v.s, ' ' || m.a || ' ' || m.b,
         |      ' ' || m.a || m.b, 'g') END AS s, v.n AS n
         |  FROM v$r v LEFT JOIN m$r m ON true),
         |c${r + 1} AS MATERIALIZED (
         |  SELECT c.doc_id, CASE WHEN m.a IS NULL THEN c.s ELSE
         |    regexp_replace(c.s, ' ' || m.a || ' ' || m.b,
         |      ' ' || m.a || m.b, 'g') END AS s
         |  FROM c$r c LEFT JOIN m$r m ON true)""".stripMargin
    }.mkString(",\n")
    val mergesUnion = (0 until rounds).map(r => s"SELECT * FROM m$r")
      .mkString("\nUNION ALL ")
    s"""WITH w AS ($wCte),
       |v0 AS MATERIALIZED (
       |  SELECT regexp_replace(w, '(.)', ' \\1', 'g') AS s,
       |    count(*) AS n
       |  FROM (SELECT unnest(l) AS w FROM w) GROUP BY w),
       |c0 AS MATERIALIZED (
       |  SELECT doc_id, coalesce(array_to_string(list_transform(l,
       |    x -> regexp_replace(x, '(.)', ' \\1', 'g')), '|'), '') AS s
       |  FROM w),
       |$iterCtes,
       |mg AS ($mergesUnion),
       |tot AS (
       |  SELECT CAST(sum(length(s) - length(replace(s, ' ', '')))
       |    AS BIGINT) AS corpus_tokens FROM c$rounds)
       |SELECT mg.merge_idx, mg.a, mg.b, tot.corpus_tokens
       |FROM mg, tot""".stripMargin
  }

  /** DuckDB n-gram list (mirror of CorpusOps.wordNgrams — 1-based,
    * empty below g words; range() is exclusive-end). */
  private def ngramSql(g: Int): String = {
    val join = (0 until g).map(o => s"l[i + $o]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len(l) - ${g - 2}, 1)), i -> $join)"
  }

  val oracleSql: Map[String, String] = Map(
    "q_quality" -> {
      val mwl = "CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE)" +
        " / len(l)"
      val ttr = "CAST(len(list_distinct(l)) AS DOUBLE) / len(l)"
      val twf = "CAST(list_max(list_transform(list_distinct(l), " +
        "d -> len(list_filter(l, x -> x = d)))) AS DOUBLE) / len(l)"
      s"""WITH w AS ($wCte),
         |s AS (SELECT doc_id, len(l) AS n, $mwl AS mwl, $ttr AS ttr,
         |  $twf AS twf FROM w)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_words,
         |  round(mwl, 6) AS mean_word_len, round(ttr, 6) AS ttr,
         |  round(twf, 6) AS top_word_frac,
         |  (n >= 30 AND n <= 90 AND mwl >= 3.0 AND mwl <= 10.0
         |    AND ttr >= 0.35 AND twf <= 0.12) AS keep
         |FROM s""".stripMargin
    },

    "q_repetition" -> {
      def frac(g: Int) =
        s"CASE WHEN len(g$g) > 0 THEN round(CAST(len(g$g) - " +
          s"len(list_distinct(g$g)) AS DOUBLE) / len(g$g), 6) END"
      s"""WITH w AS ($wCte),
         |g AS (SELECT doc_id, ${ngramSql(2)} AS g2, ${ngramSql(3)} AS g3
         |  FROM w)
         |SELECT doc_id, ${frac(2)} AS dup2_frac, ${frac(3)} AS dup3_frac
         |FROM g""".stripMargin
    },

    "q_bm25" -> {
      val (k1, b) = (1.2, 0.75)
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(l, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(", ")
      val dfs = bm25Terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      // identical operation shapes/constants as Bm25.score (Scala-folded
      // constants interpolated so both engines see the same doubles)
      val terms = bm25Terms.indices.map { i =>
        s"(ln(1.0 + ((n - df$i + 0.5) / (df$i + 0.5))) * (tf$i * ${k1 + 1.0})" +
          s" / (tf$i + ${k1} * (${1.0 - b} + ((${b} * dl) / avgdl))))"
      }
      val score = terms.reduceLeft((a, t) => s"($a + $t)")
      s"""WITH w AS ($wCte),
         |pd AS (SELECT doc_id, CAST(len(l) AS DOUBLE) AS dl, $tfs FROM w),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
         |  $dfs FROM pd),
         |sc AS (SELECT doc_id, $score AS bm25 FROM pd, st)
         |SELECT doc_id, round(bm25, 6) AS bm25, rank FROM (
         |  SELECT doc_id, bm25,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM sc) WHERE rank <= 50""".stripMargin
    },

    "q_decontaminate" ->
      s"""WITH w AS ($wCte),
         |sh AS (SELECT doc_id,
         |  unnest(list_distinct(${ngramSql(4)})) AS s FROM w),
         |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
         |SELECT tr.doc_id, count(*) AS n_shared
         |FROM tr JOIN ev USING (s) GROUP BY tr.doc_id""".stripMargin,

    // the scale-path variant is result-identical by construction (the
    // bitset prefilter only removes rows the exact join would drop)
    "q_decontaminate_scale" ->
      s"""WITH w AS ($wCte),
         |sh AS (SELECT doc_id,
         |  unnest(list_distinct(${ngramSql(4)})) AS s FROM w),
         |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
         |SELECT tr.doc_id, count(*) AS n_shared
         |FROM tr JOIN ev USING (s) GROUP BY tr.doc_id""".stripMargin,

    "q_dup_spans" ->
      s"""WITH w AS ($wCte),
         |g AS (
         |  SELECT doc_id, pos,
         |    md5(array_to_string(list_slice(l, pos, pos + 7), ' ')) AS fp
         |  FROM (SELECT doc_id, l,
         |        unnest(range(1, greatest(len(l) - 6, 1))) AS pos FROM w)),
         |counts AS (SELECT fp, count(*) AS c FROM g GROUP BY fp),
         |dup AS (SELECT doc_id, pos FROM g JOIN counts USING (fp)
         |        WHERE c > 1),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT pos) AS n_dup_spans,
         |    count(DISTINCT pos + o) AS n_dup_tokens
         |  FROM dup CROSS JOIN (SELECT unnest(range(0, 8)) AS o)
         |  GROUP BY doc_id)
         |SELECT w.doc_id, len(w.l) AS n_tokens,
         |  greatest(len(w.l) - 7, 0) AS n_spans,
         |  coalesce(c.n_dup_spans, 0) AS n_dup_spans,
         |  coalesce(c.n_dup_tokens, 0) AS n_dup_tokens,
         |  CASE WHEN len(w.l) > 7 THEN
         |    round(CAST(coalesce(c.n_dup_spans, 0) AS DOUBLE)
         |          / (len(w.l) - 7), 6)
         |  ELSE 0.0 END AS dup_frac
         |FROM w LEFT JOIN cov c USING (doc_id)""".stripMargin,

    "q_source_kl" ->
      s"""WITH w AS ($wCte),
         |tok AS (SELECT source, unnest(l) AS t FROM w),
         |st AS (SELECT source, t, count(*) AS cst FROM tok GROUP BY 1, 2),
         |s AS (SELECT source, CAST(sum(cst) AS DOUBLE) AS ns
         |      FROM st GROUP BY 1),
         |tt AS (SELECT t, CAST(sum(cst) AS DOUBLE) AS ct
         |       FROM st GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS n FROM tt),
         |terms AS (
         |  SELECT st.source, st.t, st.cst,
         |    (CAST(st.cst AS DOUBLE) / s.ns)
         |      * ln((CAST(st.cst AS DOUBLE) / s.ns) / (tt.ct / tot.n))
         |      AS term
         |  FROM st JOIN s USING (source) JOIN tt USING (t) CROSS JOIN tot)
         |SELECT source, CAST(sum(cst) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  round(list_reduce(list(term ORDER BY t), (a, b) -> a + b), 6)
         |    AS kl
         |FROM terms GROUP BY source""".stripMargin,

    "q_rate_sample" -> {
      // u = first 13 md5 hex digits / 16^13 (52 bits — double-exact on
      // both engines); 16^13 = 2^52, written as its exact decimal repr
      val u = s"(CAST(${Dedup.md5ChunkSql("m", 1, 13)} AS DOUBLE) " +
        s"/ ${math.pow(16.0, 13)})"
      s"""WITH h AS (
         |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS m
         |  FROM documents)
         |SELECT doc_id, source FROM h
         |WHERE $u < CASE source WHEN 'src0' THEN 1.0
         |  WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25
         |  ELSE 0.1 END""".stripMargin
    },

    "q_interleave" -> {
      val chunk = Dedup.md5ChunkSql("m", 1, 13)
      s"""WITH h AS (
         |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS m
         |  FROM documents),
         |s AS (SELECT doc_id, $chunk % 8 AS shard, m FROM h)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY m, doc_id)
         |    AS BIGINT) AS position
         |FROM s""".stripMargin
    },

    "q_seg_dedup" ->
      s"""WITH w AS ($wCte),
         |segs AS (
         |  SELECT doc_id, CAST(i AS INT) AS i,
         |    array_to_string(list_slice(l,
         |      CAST(i AS INT) * 5 + 1, CAST(i AS INT) * 5 + 5), ' ') AS seg
         |  FROM (SELECT doc_id, l,
         |        unnest(range(0, CAST(ceil(len(l) / 5.0) AS BIGINT))) AS i
         |        FROM w)),
         |counts AS (SELECT md5(seg) AS fp, count(*) AS c
         |           FROM segs GROUP BY 1),
         |j AS (SELECT s.doc_id, s.i, s.seg, c.c
         |      FROM segs s JOIN counts c ON md5(s.seg) = c.fp),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dropped,
         |    string_agg(CASE WHEN c <= 1 THEN seg END, ' ' ORDER BY i)
         |      AS clean_text
         |  FROM j GROUP BY doc_id)
         |SELECT w.doc_id, coalesce(a.n_segments, 0) AS n_segments,
         |  coalesce(a.n_dropped, 0) AS n_dropped,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM w LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q_blocklist" ->
      s"""WITH w AS ($wCte)
         |SELECT doc_id,
         |  CAST(len(list_filter(l,
         |    x -> list_contains(['slow', 'dup', 'lorem'], x))) AS BIGINT)
         |    AS n_flagged,
         |  len(list_filter(l,
         |    x -> list_contains(['slow', 'dup', 'lorem'], x))) = 0 AS keep
         |FROM w""".stripMargin,

    "q_token_bpe" ->
      s"""WITH w AS ($wCte)
         |SELECT doc_id, len(l) AS n_words,
         |  ${Bpe.tokenCountSql("l", Bpe.pinnedMerges)} AS n_tokens_bpe
         |FROM w""".stripMargin,

    "q_bpe_train" -> bpeTrainSql(24),

    "q_dup_span_ranges" ->
      s"""WITH w AS ($wCte),
         |g AS (
         |  SELECT doc_id, pos,
         |    md5(array_to_string(list_slice(l, pos, pos + 7), ' ')) AS fp
         |  FROM (SELECT doc_id, l,
         |        unnest(range(1, greatest(len(l) - 6, 1))) AS pos FROM w)),
         |counts AS (SELECT fp, count(*) AS c FROM g GROUP BY fp),
         |dup AS (SELECT doc_id, pos FROM g JOIN counts USING (fp)
         |        WHERE c > 1),
         |i AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |      ORDER BY pos) > 8 THEN 1 ELSE 0 END AS brk
         |  FROM dup),
         |s AS (
         |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
         |  FROM i)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
         |  max(pos) + 7 - min(pos) + 1 AS span_tokens
         |FROM s GROUP BY doc_id, isl""".stripMargin,

    "q_dup_excise" ->
      s"""WITH w AS ($wCte),
         |g AS (
         |  SELECT doc_id, pos,
         |    md5(array_to_string(list_slice(l, pos, pos + 7), ' ')) AS fp
         |  FROM (SELECT doc_id, l,
         |        unnest(range(1, greatest(len(l) - 6, 1))) AS pos FROM w)),
         |counts AS (SELECT fp, count(*) AS c FROM g GROUP BY fp),
         |dup AS (SELECT doc_id, pos FROM g JOIN counts USING (fp)
         |        WHERE c > 1),
         |i AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |      ORDER BY pos) > 8 THEN 1 ELSE 0 END AS brk
         |  FROM dup),
         |s AS (
         |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
         |  FROM i),
         |r AS (SELECT doc_id, min(pos) AS lo, max(pos) + 7 AS hi
         |  FROM s GROUP BY doc_id, isl),
         |rl AS (SELECT doc_id, list([lo, hi]) AS rs FROM r GROUP BY doc_id),
         |kview AS (SELECT w.doc_id, w.l,
         |    coalesce(rl.rs, []) AS rs
         |  FROM w LEFT JOIN rl USING (doc_id)),
         |o AS (SELECT doc_id, l,
         |    list_transform(list_filter(range(1, len(l) + 1),
         |      i -> len(list_filter(rs,
         |        p -> i >= p[1] AND i <= p[2])) = 0), i -> l[i]) AS kept
         |  FROM kview)
         |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         |  CAST(len(l) - len(kept) AS BIGINT) AS n_removed,
         |  coalesce(array_to_string(kept, ' '), '') AS clean_text
         |FROM o""".stripMargin,

    "q_hash_split" -> {
      // hex16(md5[1..4]) via per-digit polynomial (exact in doubles)
      val digit = (i: Int) =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
      val bucket = s"((${digit(1)} * 4096 + ${digit(2)} * 256 + " +
        s"${digit(3)} * 16 + ${digit(4)}) % 10)"
      s"""WITH w AS ($wCte),
         |h AS (SELECT doc_id, source, len(l) AS n_tok,
         |  md5(CAST(doc_id AS VARCHAR)) AS m FROM w),
         |a AS (SELECT source, CASE WHEN $bucket <= 7 THEN 'train'
         |    WHEN $bucket = 8 THEN 'val' ELSE 'test' END AS split, n_tok
         |  FROM h)
         |SELECT source, split, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM a GROUP BY source, split""".stripMargin
    },

    "q_seq_pack" ->
      s"""WITH w AS ($wCte)
         |SELECT doc_id, source, CAST(len(l) AS BIGINT) AS n_tokens,
         |  CAST(floor(coalesce(sum(len(l)) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    1 PRECEDING), 0) / 512) AS BIGINT) AS bin
         |FROM w""".stripMargin,

    "q_pack_ffd" -> {
      // flat-BIGINT-list fold state [b, fill_1..fill_b, (id, bin, t)*] —
      // the exact recurrence the Spark aggregate() runs (DuckDB 1.0's
      // list_reduce mangles struct accumulators; flat lists fold
      // correctly). DuckDB list_position returns NULL on no-match where
      // Spark's array_position returns 0 — coalesce. list_slice is
      // end-INCLUSIVE where Spark's slice takes a length.
      val b = "CAST(acc[1] AS INT)"
      val fills = s"list_slice(acc, 2, $b + 1)"
      val t = "e[2]"
      val pos = s"coalesce(list_position(list_transform($fills, " +
        s"f -> f + $t <= 128), true), 0)"
      s"""WITH w AS ($wCte),
         |d AS (SELECT source, doc_id AS id, CAST(len(l) AS BIGINT)
         |  AS tokens FROM w),
         |g AS (SELECT source, list_transform(
         |    list_sort(list(struct_pack(negt := -tokens, id := id,
         |      tokens := tokens))),
         |    x -> [CAST(1 AS BIGINT), x.tokens, x.id, CAST(1 AS BIGINT),
         |      x.tokens]) AS lst
         |  FROM d GROUP BY source),
         |f AS (SELECT source, list_reduce(lst, (acc, e) -> list_concat(
         |    list_concat(list_concat(
         |      [CASE WHEN $pos = 0 THEN acc[1] + 1 ELSE acc[1] END],
         |      CASE WHEN $pos = 0
         |        THEN list_concat($fills, [$t])
         |        ELSE list_concat(list_concat(
         |          list_slice($fills, 1, $pos - 1),
         |          [$fills[$pos] + $t]),
         |          list_slice($fills, $pos + 1, len($fills))) END),
         |      list_slice(acc, $b + 2, len(acc))),
         |    [e[3],
         |     CASE WHEN $pos = 0 THEN acc[1] + 1 ELSE $pos END,
         |     $t])) AS st FROM g),
         |sel AS (SELECT source, st,
         |  unnest(range(0, (len(st) - 1 - st[1]) // 3)) AS m FROM f)
         |SELECT source,
         |  st[CAST(st[1] + 2 + 3 * m AS INT)] AS doc_id,
         |  st[CAST(st[1] + 4 + 3 * m AS INT)] AS n_tokens,
         |  st[CAST(st[1] + 3 + 3 * m AS INT)] AS bin
         |FROM sel""".stripMargin
    },

    "q_unimax" ->
      s"""WITH w AS ($wCte),
         |per AS (SELECT source, CAST(sum(len(l)) AS BIGINT) AS n_tokens
         |  FROM w GROUP BY source),
         |b AS (SELECT 3.7 * sum(n_tokens) AS bud FROM per),
         |ord AS (SELECT source, n_tokens,
         |  row_number() OVER (ORDER BY n_tokens, source) AS i,
         |  count(*) OVER () AS m,
         |  coalesce(sum(CAST(n_tokens AS DOUBLE) * 4.0)
         |    OVER (ORDER BY n_tokens, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |    AS cum
         |FROM per),
         |flg AS (SELECT source, n_tokens, i, m, cum,
         |  min(CASE WHEN CAST(n_tokens AS DOUBLE) * 4.0 * (m - i + 1)
         |      <= bud - cum THEN 1 ELSE 0 END)
         |    OVER (ORDER BY n_tokens, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |    AS capped
         |FROM ord, b),
         |tot AS (SELECT
         |  coalesce(max(CASE WHEN capped
         |    THEN cum + CAST(n_tokens AS DOUBLE) * 4.0 END), 0.0)
         |    AS cap_sum,
         |  sum(CASE WHEN capped THEN 1 ELSE 0 END) AS p FROM flg)
         |SELECT source, n_tokens,
         |  round(CASE WHEN capped THEN CAST(n_tokens AS DOUBLE) * 4.0
         |    ELSE (bud - cap_sum) / (m - p) END, 2) AS alloc_tokens,
         |  round(CASE WHEN capped THEN 4.0
         |    ELSE (bud - cap_sum) / (m - p) / CAST(n_tokens AS DOUBLE)
         |    END, 6) AS epochs,
         |  capped
         |FROM flg, b, tot""".stripMargin,

    "q_mixture" ->
      s"""WITH w AS ($wCte),
         |ps AS (SELECT source, count(*) AS n_docs, sum(len(l)) AS n_tokens
         |  FROM w GROUP BY source),
         |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
         |  sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS znum FROM ps)
         |SELECT source, n_docs,
         |  round(CAST(n_tokens AS DOUBLE) / tot, 6) AS token_share,
         |  round(pow(CAST(n_tokens AS DOUBLE), 0.5) / znum, 6) AS weight
         |FROM ps, t""".stripMargin,

    "q_vocab" ->
      s"""WITH w AS ($wCte),
         |t AS (SELECT doc_id, unnest(l) AS token FROM w),
         |c AS (SELECT token, count(*) AS n_occurrences,
         |  count(DISTINCT doc_id) AS n_docs FROM t GROUP BY token)
         |SELECT rank, token, n_occurrences, n_docs FROM (
         |  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC,
         |    token) AS rank FROM c) WHERE rank <= 100""".stripMargin,

    "q_sample" ->
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5""".stripMargin,

    "q_weighted_sample" -> {
      val u = s"(CAST(${Dedup.md5ChunkSql("md5(CAST(doc_id AS VARCHAR))",
        1, 13)} AS DOUBLE) / ${math.pow(16.0, 13)})"
      s"""WITH keyed AS (
         |  SELECT source, doc_id,
         |    round(ln(greatest($u, 1e-300)), 6)
         |      / CAST(n_chars AS DOUBLE) AS key
         |  FROM documents),
         |sel AS (SELECT source, doc_id, key,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY key DESC, doc_id) AS INT) AS rank FROM keyed)
         |SELECT source, rank, doc_id, key FROM sel WHERE rank <= 10"""
        .stripMargin
    },

    "q_chunk" ->
      s"""WITH w AS ($wCte),
         |c AS (SELECT doc_id, l, unnest(range(0,
         |  CASE WHEN len(l) > 0
         |    THEN CAST(floor((len(l) - 1) / 24) AS BIGINT) + 1
         |    ELSE 0 END)) AS k FROM w)
         |SELECT doc_id, k AS chunk_idx,
         |  CAST(len(l[(k * 24 + 1):(k * 24 + 32)]) AS BIGINT)
         |    AS n_chunk_tokens,
         |  array_to_string(l[(k * 24 + 1):(k * 24 + 32)], ' ')
         |    AS chunk_text
         |FROM c""".stripMargin,

    "q_dup_clusters" -> {
      // 4 unrolled min-label-propagation rounds over the simhash
      // near-dup pairs (mirror of DupClusters.minLabelClusters)
      val rounds = (1 to 4).map { t =>
        s"""l$t AS (
           |  SELECT l.id,
           |    least(l.cluster, coalesce(min(n.cluster), l.cluster))
           |      AS cluster
           |  FROM l${t - 1} l
           |  LEFT JOIN edges e ON e.src = l.id
           |  LEFT JOIN l${t - 1} n ON n.id = e.dst
           |  GROUP BY l.id, l.cluster)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (SELECT id_a, id_b FROM
         |  (${QueriesText.simhashPairsSql})),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS id, src AS cluster FROM edges),
         |$rounds
         |SELECT id AS doc_id, cluster FROM l4""".stripMargin
    },

    "q_ngram_lm" -> lmScoredSql,

    "q_lm_buckets" ->
      // cut points: exact 1/3 + 2/3 quantiles of the round-6 scores,
      // re-rounded — quantile_cont ≡ ExactPercentiles (q_quantiles)
      s"""WITH scored AS ($lmScoredSql),
         |cuts AS (SELECT
         |  round(quantile_cont(avg_logprob, 1.0/3), 6) AS c1,
         |  round(quantile_cont(avg_logprob, 2.0/3), 6) AS c2
         | FROM scored WHERE avg_logprob IS NOT NULL)
         |SELECT doc_id, n_bigrams, avg_logprob,
         | CASE WHEN avg_logprob >= c2 THEN 'head'
         |   WHEN avg_logprob >= c1 THEN 'middle'
         |   ELSE 'tail' END AS bucket
         |FROM scored, cuts""".stripMargin,

    "q_gopher" ->
      """WITH w AS (SELECT doc_id, text,
        |  regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        | FROM documents),
        |s AS (SELECT doc_id, len(l) AS n_words,
        |  CASE WHEN len(l) > 0 THEN
        |    list_sum(list_transform(l, x -> CAST(length(x) AS BIGINT)))
        |      / CAST(len(l) AS DOUBLE) END AS mwl,
        |  len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym,
        |  CASE WHEN len(l) > 0 THEN
        |    len(list_filter(l, x -> regexp_matches(x, '[a-z]')))
        |      / CAST(len(l) AS DOUBLE) END AS af,
        |  len(list_filter(l, x -> list_contains(
        |    ['the','be','to','of','and','that','have','with'], x)))
        |    AS n_stop
        | FROM w)
        |SELECT doc_id, n_words,
        | round(mwl, 6) AS mean_word_len,
        | round(af, 6) AS alpha_frac,
        | n_stop AS n_stopwords,
        | (n_words >= 20 AND n_words <= 100000) AS r_word_count,
        | (mwl IS NOT NULL AND mwl >= 3 AND mwl <= 10) AS r_mean_word_len,
        | (n_words > 0 AND n_sym / CAST(n_words AS DOUBLE) <= 0.1)
        |   AS r_symbol_ratio,
        | (af IS NOT NULL AND af >= 0.8) AS r_alpha_frac,
        | (n_stop >= 2) AS r_stopwords,
        | ((n_words >= 20 AND n_words <= 100000)
        |   AND (mwl IS NOT NULL AND mwl >= 3 AND mwl <= 10)
        |   AND (n_words > 0 AND n_sym / CAST(n_words AS DOUBLE) <= 0.1)
        |   AND (af IS NOT NULL AND af >= 0.8)
        |   AND (n_stop >= 2)) AS keep
        |FROM s""".stripMargin,

    "q_heavy_hitters" ->
      s"""WITH w AS ($wCte),
         |g AS (SELECT unnest(${ngramSql(2)}) AS token FROM w),
         |n AS (SELECT count(*) AS n FROM g)
         |SELECT token, count(*) AS n_occurrences,
         |  round(count(*) / (1.0 * n.n), 6) AS frac
         |FROM g, n GROUP BY token, n.n
         |HAVING count(*) >= 0.001 * n.n""".stripMargin,

    // true-reachability min label: the oracle for CONVERGED components
    // is transitive closure (recursive CTE), not an unrolled budget
    "q_cc_components" -> ccSql,

    "q_canonical" ->
      // champion per cluster: max n_chars, ties to smallest doc_id
      s"""WITH comp AS ($ccSql),
         |j AS (SELECT comp.doc_id, comp.cluster, d.n_chars
         |  FROM comp JOIN documents d ON d.doc_id = comp.doc_id),
         |ch AS (SELECT cluster, doc_id AS champ FROM (
         |   SELECT cluster, doc_id, row_number() OVER (
         |     PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
         |   FROM j) WHERE rn = 1)
         |SELECT j.doc_id, j.cluster, j.n_chars,
         | (j.doc_id = ch.champ) AS is_canonical
         |FROM j JOIN ch USING (cluster)""".stripMargin,

    "q_domain_cap" ->
      """SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rk FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 10""".stripMargin,

    "q_dsir" -> {
      val b = "(" + Dedup.md5ChunkSql("md5(t)", 1, 13) + ") % 256"
      val uDoc = s"(CAST(${Dedup.md5ChunkSql(
        "md5(CAST(doc_id AS VARCHAR))", 1, 13)} AS DOUBLE) " +
        s"/ ${math.pow(16.0, 13)})"
      s"""WITH w AS ($wCte),
         |f AS (SELECT doc_id, (source = 'src0') AS tgt,
         |  list_concat(l, ${ngramSql(2)}) AS f FROM w),
         |pos AS (SELECT doc_id, tgt, i AS pos, f[i] AS t
         |  FROM f, unnest(range(1, len(f) + 1)) AS r(i)),
         |pb AS (SELECT doc_id, tgt, pos, $b AS b FROM pos),
         |cnt AS (SELECT b, count(*) AS cr,
         |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
         |  FROM pb GROUP BY b),
         |tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS tr,
         |    CAST(sum(ct) AS DOUBLE) AS tt FROM cnt),
         |lam AS (SELECT b,
         |    ln(((ct + 1.0) / (tt + 256.0)) / ((cr + 1.0) / (tr + 256.0)))
         |      AS lam FROM cnt, tot),
         |doc AS (SELECT pb.doc_id, count(*) AS n_feats,
         |    list_reduce(list(lam ORDER BY pos), (a, x) -> a + x) AS s
         |  FROM pb JOIN lam USING (b) GROUP BY pb.doc_id),
         |k AS (SELECT w.doc_id,
         |    CAST(coalesce(d.n_feats, 0) AS BIGINT) AS n_feats, d.s,
         |    round(d.s - ln(-ln($uDoc)), 6) AS key
         |  FROM w LEFT JOIN doc d USING (doc_id)),
         |cut AS (SELECT round(quantile_cont(key, 0.75), 6) AS c
         |  FROM k WHERE key IS NOT NULL)
         |SELECT doc_id, n_feats, round(s, 6) AS log_w, key,
         |  (key IS NOT NULL AND key >= c) AS keep
         |FROM k, cut""".stripMargin
    },

    "q_pipeline" -> {
      val u = s"(CAST(${Dedup.md5ChunkSql("m", 1, 13)} AS DOUBLE) " +
        s"/ ${math.pow(16.0, 13)})"
      val chunk = Dedup.md5ChunkSql("m", 1, 13)
      s"""WITH c AS (SELECT doc_id, source,
         |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
         |      '[[:cntrl:]]', ' ', 'g'), '\\s+', ' ', 'g')) AS ct
         |  FROM documents),
         |k AS (SELECT doc_id, source FROM c
         |  WHERE len(list_filter(
         |    regexp_extract_all(lower(ct), '[a-z0-9_]+'),
         |    w -> list_contains(['slow', 'dup', 'lorem'], w))) = 0),
         |h AS (SELECT doc_id, source,
         |    md5(CAST(doc_id AS VARCHAR)) AS m FROM k),
         |samp AS (SELECT doc_id, m FROM h
         |  WHERE $u < CASE source WHEN 'src0' THEN 1.0
         |    WHEN 'src1' THEN 0.5 ELSE 0.75 END),
         |sh AS (SELECT doc_id, $chunk % 4 AS shard, m FROM samp)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY m, doc_id) AS BIGINT) AS position
         |FROM sh""".stripMargin
    },

    "q_collocations" ->
      s"""WITH w AS ($wCte),
         |uni AS (SELECT t, count(*) AS c FROM
         |  (SELECT unnest(l) AS t FROM w) GROUP BY t),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
         |bi AS (SELECT bg, count(*) AS c12 FROM
         |  (SELECT unnest(${ngramSql(2)}) AS bg FROM w) GROUP BY bg
         |  HAVING count(*) >= 20),
         |sc AS (
         |  SELECT bi.bg AS bigram, bi.c12, u1.c AS c1, u2.c AS c2,
         |    ln(bi.c12 * n.n / (u1.c * u2.c)) AS pmi
         |  FROM bi
         |  JOIN uni u1 ON u1.t = split_part(bi.bg, ' ', 1)
         |  JOIN uni u2 ON u2.t = split_part(bi.bg, ' ', 2), n)
         |SELECT CAST(rank AS INT) AS rank, bigram, c12, c1, c2,
         |  round(pmi, 6) AS pmi
         |FROM (SELECT *, row_number() OVER (ORDER BY round(pmi, 6) DESC,
         |  bigram) AS rank FROM sc) WHERE rank <= 50""".stripMargin
  )

  /** Oracle mirror of [[graft.text.NgramLm.scoreStupidBackoff]]:
    * (doc_id, n_bigrams, avg_logprob round-6); train-split filter is the
    * same md5-bucket mirror as q_hash_split. */
  private lazy val lmScoredSql: String = {
    val digit = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR))" +
        s", $i, 1)) - 1)"
    val bucket = s"((${digit(1)} * 4096 + ${digit(2)} * 256 + " +
      s"${digit(3)} * 16 + ${digit(4)}) % 10)"
    s"""WITH w AS ($wCte),
       |tr AS (SELECT l FROM w WHERE $bucket <= 7),
       |uni AS (SELECT t, count(*) AS c FROM
       |  (SELECT unnest(l) AS t FROM tr) GROUP BY t),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) + count(*) AS nu FROM uni),
       |bi AS (SELECT bg, count(*) AS c FROM
       |  (SELECT unnest(${ngramSql(2)}) AS bg FROM tr) GROUP BY bg),
       |pos AS (SELECT doc_id, i AS pos, l[i] || ' ' || l[i + 1] AS bg,
       |    l[i] AS w1, l[i + 1] AS w2
       |  FROM w, unnest(range(1, greatest(len(l), 1))) AS t(i)),
       |sc AS (SELECT p.doc_id, p.pos,
       |    CASE WHEN b.c IS NOT NULL THEN ln(b.c / (1.0 * u1.c))
       |      ELSE ln(0.4 * (coalesce(u2.c, 0) + 1) / tot.nu) END AS lp
       |  FROM pos p
       |  LEFT JOIN bi b ON b.bg = p.bg
       |  LEFT JOIN uni u1 ON u1.t = p.w1
       |  LEFT JOIN uni u2 ON u2.t = p.w2, tot),
       |agg AS (SELECT doc_id, count(*) AS n_bigrams,
       |    list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s
       |  FROM sc GROUP BY doc_id)
       |SELECT w.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  round(a.s / a.n_bigrams, 6) AS avg_logprob
       |FROM w LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Oracle mirror of converged connected components over the simhash
    * near-dup pairs: (doc_id, cluster) by true reachability. */
  private lazy val ccSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM
       |  (${QueriesText.simhashPairsSql})),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
       |r AS (
       |  SELECT DISTINCT src AS id, src AS reach FROM edges
       |  UNION
       |  SELECT e.src AS id, r.reach AS reach
       |  FROM edges e JOIN r ON r.id = e.dst)
       |SELECT id AS doc_id, min(reach) AS cluster FROM r
       |GROUP BY id""".stripMargin
}
