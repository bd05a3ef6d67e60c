package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.GraftTransformer

/** Corpus-curation operators for large-scale pretraining pipelines:
  * Gopher-style quality filtering, n-gram repetition scoring, BM25
  * retrieval scoring, benchmark decontamination, deterministic
  * train/val/test splitting, context-window sequence packing, and
  * source-mixture weighting.
  *
  * No counterpart exists in the reference (centimators has no text
  * layer); these are the north-star LLM-data-pipeline extensions
  * (SURVEY.md §7.6). All per-document statistics are higher-order-
  * function expressions over the token array — per-row, shuffle-free,
  * scan-speed at 100 TB. The only shuffles are the ones the semantics
  * force: BM25's global document-frequency aggregate (one tiny scalar
  * row, broadcast back), decontamination's equi-join against the (small,
  * broadcast) eval-set shingles, packing's per-source window, and the
  * mixture/split per-source aggregates.
  */
object CorpusOps {

  /** Lowercased word-token array — the tokenization every corpus
    * operator shares (same token class as Dedup.simHash / minhash
    * shingles). Runs as the native [[graft.functions.WordTokens]]
    * kernel — value-identical to
    * `regexp_extract_all(lower(text), "[a-z0-9_]+", 0)` (the form the
    * DuckDB oracles keep; WordKernelSpec pins kernel ≡ regex) with no
    * per-row regex-engine cost. */
  def words(text: Column): Column = graft.functions.WordTokens(text)

  /** Per-word occurrence counts within one document: for each distinct
    * word, how many times it appears. O(distinct·n) per row — cheap for
    * natural documents, zero shuffle. */
  private[text] def perWordCounts(w: Column): Column =
    transform(array_distinct(w), d => size(filter(w, x => x === d)))

  /** Overlapping word n-grams joined with single spaces (positions
    * 1..n-g+1; empty array when the document is shorter than g, and —
    * via the coalesce — when the word ARRAY itself is null, matching
    * the staged when-guard form's null semantics). Runs as the native
    * [[graft.functions.WordNgrams]] kernel — one codegen'd pass instead
    * of the interpreted transform/element_at/concat_ws chain
    * (higher-order functions are CodegenFallback); WordKernelSpec pins
    * kernel ≡ staged form. */
  def wordNgrams(w: Column, g: Int): Column =
    coalesce(graft.functions.WordNgrams(w, g),
      typedlit(Array.empty[String]))

  /** The staged-HOF n-gram form the native kernel replaced — kept as
    * the equivalence REFERENCE (WordKernelSpec pins kernel ≡ this on
    * randomized inputs; the DuckDB oracles mirror this form). */
  private[graft] def wordNgramsStaged(w: Column, g: Int): Column = {
    val n = size(w) - (g - 1)
    when(n > 0,
      transform(sequence(lit(1), greatest(n, lit(1))),
        i => concat_ws(" ", (0 until g).map(o => element_at(w, i + o)): _*)))
      .otherwise(typedlit(Array.empty[String]))
  }
}

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Appendix A1.1 — public paper): word
  * count bounds, mean word length band, type-token ratio floor, and a
  * most-frequent-word share ceiling. Emits the four statistics plus the
  * combined `keep` flag, all from one token-array projection. */
case class QualityFilterTransformer(textCol: String, prefix: String = "qf",
    minWords: Int = 30, maxWords: Int = 90,
    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
    minTypeTokenRatio: Double = 0.35, maxTopWordFrac: Double = 0.12)
    extends GraftTransformer {
  def outputNames: Seq[String] = Seq("n_words", "mean_word_len", "ttr",
    "top_word_frac", "keep").map(s => s"${prefix}_$s")
  def transform(df: DataFrame): DataFrame = {
    // token array materialized once (lambda bodies sit outside common-
    // subexpression elimination — see Decontaminate.overlap)
    val w = col("__qf_w")
    val n = size(w)
    val nd = n.cast("double")
    val meanLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / nd
    val ttr = size(array_distinct(w)).cast("double") / nd
    val twf = array_max(CorpusOps.perWordCounts(w)).cast("double") / nd
    df.withColumn("__qf_w", CorpusOps.words(col(textCol)))
      .withColumn(s"${prefix}_n_words", n.cast("long"))
      .withColumn(s"${prefix}_mean_word_len", meanLen)
      .withColumn(s"${prefix}_ttr", ttr)
      .withColumn(s"${prefix}_top_word_frac", twf)
      .withColumn(s"${prefix}_keep",
        n >= minWords && n <= maxWords &&
          meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
          ttr >= minTypeTokenRatio && twf <= maxTopWordFrac)
      .drop("__qf_w")
  }
}

/** Duplicate-n-gram repetition scores (the Gopher/MassiveText repetition
  * filters): fraction of overlapping word 2-grams and 3-grams that are
  * repeats of an earlier n-gram in the same document. Null when the
  * document has no n-gram of that size. */
case class RepetitionTransformer(textCol: String, prefix: String = "rep")
    extends GraftTransformer {
  def outputNames: Seq[String] =
    Seq(s"${prefix}_dup2_frac", s"${prefix}_dup3_frac")
  def transform(df: DataFrame): DataFrame = {
    def dupFrac(g: Int): Column = {
      val grams = col(s"__rep_g$g")
      val total = size(grams).cast("double")
      val dups = (size(grams) - size(array_distinct(grams))).cast("double")
      when(total > 0, dups / total)
    }
    // token + n-gram arrays staged as columns (see Decontaminate.overlap)
    df.withColumn("__rep_w", CorpusOps.words(col(textCol)))
      .withColumn("__rep_g2", CorpusOps.wordNgrams(col("__rep_w"), 2))
      .withColumn("__rep_g3", CorpusOps.wordNgrams(col("__rep_w"), 3))
      .withColumn(s"${prefix}_dup2_frac", dupFrac(2))
      .withColumn(s"${prefix}_dup3_frac", dupFrac(3))
      .drop("__rep_w", "__rep_g2", "__rep_g3")
  }
}

/** BM25 scoring of a whole corpus against a fixed term set (Robertson &
  * Zaragoza 2009). Per-document term frequencies are HOF counts over the
  * token array (no per-term explode); the corpus statistics — N, average
  * document length, per-term document frequency — reduce to ONE scalar
  * row that broadcasts back over the corpus: two narrow passes, no
  * wide shuffle, scales to any corpus size. */
object Bm25 {
  def score(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty term set")
    val w = CorpusOps.words(col(textCol))
    val perDoc = docs.select(
      col(idCol) +: size(w).cast("double").as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(w, x => x === lit(t))).cast("double").as(s"__tf_$i")
        }: _*)
    val aggs = count(lit(1)).cast("double").as("__n") +:
      avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum((col(s"__tf_$i") > 0).cast("double")).as(s"__df_$i"))
    val stats = perDoc.agg(aggs.head, aggs.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    // one left-associated sum so the oracle SQL reproduces the exact
    // IEEE result (same trick as the sequence scorers)
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf_$i")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df_$i") + 0.5) / (col(s"__df_$i") + 0.5))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          (lit(b) * col("__dl")) / col("__avgdl")))
    }
    scored.select(col(idCol),
      termScores.reduceLeft(_ + _).as("bm25"))
  }
}

/** Benchmark decontamination: flag corpus documents sharing any word
  * `shingleSize`-gram with an evaluation set (the standard n-gram
  * overlap check run before pretraining). The eval side collapses to
  * DISTINCT shingles — a small relation that broadcasts; the corpus side
  * explodes distinct shingles per document and equi-joins, so the work
  * is one broadcast-hash join at scan speed, never a quadratic
  * comparison. */
object Decontaminate {
  /** Returns one row per contaminated non-eval document:
    * (idCol, n_shared) with n_shared = distinct shared shingles. */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, shingleSize: Int = 5): DataFrame = {
    // materialize the token array in its own projection first: the n-gram
    // lambda references the array once per gram element, and a lambda
    // body is outside common-subexpression elimination — inlining the
    // regexp_extract_all would re-run the regex per shingle position
    val base = docs.select(col(idCol), isEval.as("__ev"),
      CorpusOps.words(col(textCol)).as("__w"))
    val sh = array_distinct(CorpusOps.wordNgrams(col("__w"), shingleSize))
    val evalSh = base.where(col("__ev"))
      .select(explode(sh).as("__sh")).distinct()
    val trainSh = base.where(!col("__ev"))
      .select(col(idCol), explode(sh).as("__sh"))
    trainSh.join(broadcast(evalSh), "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Decontamination against a reference set too large to broadcast —
    * e.g. screening a fresh crawl against the n-grams of an existing
    * trillion-token training corpus, where neither join side fits in a
    * broadcast relation.
    *
    * Same results as [[overlap]] (the oracle is shared), different plan:
    * a [[graft.functions.HashBitset]] prefilter (2 MiB, built
    * distributively in one pass over the reference side — in a real
    * pipeline it is built once offline and reused across corpus shards)
    * drops ~all clean shingles map-side, so the exact-confirm SHUFFLE
    * join's exchanges carry only prefilter survivors: bitset false
    * positives plus true contamination, instead of every (doc, shingle)
    * pair of the corpus. The join is hinted shuffle-hash — the point of
    * the variant is that nothing broadcasts but the 2 MiB filter. */
  def overlapLargeRef(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, shingleSize: Int = 5): DataFrame = {
    import graft.dedup.Dedup
    import graft.functions.HashBitset
    val base = docs.select(col(idCol), isEval.as("__ev"),
      CorpusOps.words(col(textCol)).as("__w"))
    val sh = array_distinct(CorpusOps.wordNgrams(col("__w"), shingleSize))
    val evalSh = base.where(col("__ev"))
      .select(explode(sh).as("__sh")).distinct()
    // one bounded scalar collect: the merged 2 MiB bitset
    val bitset = evalSh
      .agg(HashBitset.agg(Dedup.md5Chunk(col("__sh"), 1, 6)))
      .head.getAs[Array[Byte]](0)
    val trainSh = base.where(!col("__ev"))
      .select(col(idCol), explode(sh).as("__sh"))
      .where(HashBitset.contains(bitset,
        Dedup.md5Chunk(col("__sh"), 1, 6)))
    trainSh.join(evalSh.hint("shuffle_hash"), "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}

/** Deterministic corpus utilities: hash splits, sequence packing,
  * mixture weights. */
object CorpusSplit {

  /** Stable train/val/test assignment from the first 4 hex digits of
    * md5(id): bucket = hex16(md5(id)[0,4)) mod 10 → 0-7 train, 8 val,
    * 9 test. Pure projection — the split never changes as the corpus
    * grows, the property that matters for reproducible pretraining. */
  def hashSplit(id: Column): Column = {
    val bucket = conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 10
    when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test")
  }

  /** Greedy context-window packing: within each `sourceCol` shard,
    * documents are laid out in `idCol` order and cut into bins of
    * `ctxTokens` by the RUNNING token count (bin = floor(tokens-before /
    * ctx)). One window per shard — the deterministic, shuffle-minimal
    * form of sequence packing (exact first-fit packing is inherently
    * sequential; at 100 TB the shard is the parallelism unit). */
  def pack(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, ctxTokens: Int): DataFrame = {
    val win = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(sourceCol), tokenCount.as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(win), lit(0L))
          / ctxTokens).cast("long"))
  }

  /** First-fit-decreasing context packing (Johnson 1973 — the classic
    * 11/9·OPT bin-packing heuristic): within each `sourceCol` shard,
    * documents sorted by (tokens DESC, id ASC) are placed into the FIRST
    * bin with room, new bins opened on demand — tighter bins than
    * [[pack]]'s running-sum cut at the cost of a per-shard sequential
    * fold. The fold is ONE `aggregate` higher-order expression over the
    * shard's collected doc list (shards are the parallelism unit and are
    * sized to bound this list — the pack() contract), state =
    * (bin fills, assignments); items larger than `ctxTokens` get their
    * own bin. The first list element seeds the accumulator and the fold
    * runs over the tail — EXACTLY DuckDB's `list_reduce` semantics, so
    * the oracle folds the identical recurrence.
    *
    * FFD invariant (spec-pinned): at most one bin per shard is ≤ half
    * full, and no bin exceeds capacity unless it holds a single
    * oversized item.
    */
  def packFfd(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, ctxTokens: Int): DataFrame = {
    val c = ctxTokens
    // The fold state is ONE FLAT BIGINT list — [b, fill_1..fill_b,
    // (id, bin, tokens)*] — because DuckDB 1.0's list_reduce mangles
    // struct-typed accumulators (verified: struct concat folds collapse
    // to the last element) while flat-list accumulators fold correctly;
    // Spark mirrors the identical flat recurrence so the two engines run
    // the same algebra step for step. A doc element is its own
    // single-doc state [1, t, id, 1, t], which seeds the fold (DuckDB
    // list_reduce semantics; Spark folds the tail onto element 1).
    val b = "cast(element_at(acc, 1) as int)"
    val fills = s"slice(acc, 2, $b)"
    val t = "element_at(e, 2)"
    // first-fit index (1-based, 0 = open a new bin)
    val pos = s"array_position(transform($fills, f -> f + $t <= $c), true)"
    val merge =
      s"""(acc, e) -> concat(
         |  array(if($pos = 0, element_at(acc, 1) + 1,
         |    element_at(acc, 1))),
         |  if($pos = 0,
         |    concat($fills, array($t)),
         |    concat(
         |      slice($fills, 1, cast($pos as int) - 1),
         |      array(element_at($fills, cast($pos as int)) + $t),
         |      slice($fills, cast($pos as int) + 1,
         |        size($fills) - cast($pos as int)))),
         |  slice(acc, $b + 2, size(acc) - $b - 1),
         |  array(element_at(e, 3),
         |    if($pos = 0, element_at(acc, 1) + 1, $pos),
         |    $t))""".stripMargin
    val sb = "cast(element_at(__st, 1) as int)"
    docs
      .select(col(sourceCol), col(idCol).as("id"),
        tokenCount.cast("long").as("tokens"))
      .groupBy(col(sourceCol))
      .agg(sort_array(collect_list(
        struct((col("tokens") * -1).as("negt"), col("id"),
          col("tokens")))).as("__sorted"))
      .withColumn("__docs", expr(
        "transform(__sorted, x -> array(1L, x.tokens, x.id, 1L, " +
          "x.tokens))"))
      .withColumn("__st", expr(
        s"""aggregate(
           |  slice(__docs, 2, greatest(size(__docs) - 1, 0)),
           |  element_at(__docs, 1),
           |  $merge)""".stripMargin))
      .select(col(sourceCol), explode(expr(
        s"""transform(
           |  sequence(0, (size(__st) - 1 - $sb) div 3 - 1),
           |  m -> named_struct(
           |    'id', element_at(__st, $sb + 2 + 3 * cast(m as int)),
           |    'bin', element_at(__st, $sb + 3 + 3 * cast(m as int)),
           |    'tokens',
           |      element_at(__st, $sb + 4 + 3 * cast(m as int))))"""
          .stripMargin)).as("__a"))
      .select(col(sourceCol), col("__a.id").as(idCol),
        col("__a.tokens").as("n_tokens"), col("__a.bin").as("bin"))
  }

  /** Vocabulary induction: the `k` most frequent tokens across the
    * corpus with document frequencies — the precursor to tokenizer /
    * vocab training. Per-document token counts come from ONE codegen'd
    * kernel ([[graft.functions.WordTokenCounts]]: tokenize + count in a
    * single byte scan), so the whole aggregation needs ONE
    * vocabulary-keyed exchange: `sum(cnt)` over per-doc rows equals the
    * occurrence count and `count(rows)` equals `count(distinct docId)`
    * because each document emits each of its distinct tokens exactly
    * once (integer arithmetic — exact). The previous
    * `explode(word_tokens) → count / countDistinct(docId)` spelling
    * paid a corpus-token-sized `(token, doc_id)` exchange before the
    * vocabulary one. Ties break deterministically by token. At 100 TB
    * the top-k is a TakeOrdered over the aggregated token counts —
    * never a global sort of the corpus: Catalyst's
    * LimitPushDownThroughWindow rewrites the `rank <= k` filter on the
    * unpartitioned row_number window into TakeOrderedAndProject(limit=k)
    * (pinned by PlanSpec).
    *
    * `idCol` identifies the document only through row uniqueness: rows
    * of `docs` must be distinct documents (true for every corpus table
    * here — doc_id is the key). */
  def topVocab(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tc = docs.select(explode(
      graft.functions.WordTokenCounts(col(textCol))).as("__tc"))
    val counts = tc.groupBy(col("__tc.token").as("token"))
      .agg(sum(col("__tc.cnt")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("token"))))
      .where(col("rank") <= k)
  }

  /** Deterministic uniform sample of `n` documents per source: keep the
    * n smallest md5(id) within each shard (hash order ≡ uniform order,
    * and the sample is STABLE under corpus growth for the surviving
    * ids — the property random() sampling lacks). One window per shard. */
  def sampleBySource(docs: DataFrame, idCol: String, sourceCol: String,
      n: Int): DataFrame = {
    val win = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("__rk", row_number().over(win))
      .where(col("__rk") <= n).drop("__rk")
  }

  /** Overlapping context-window chunking: each document's token array is
    * cut into chunks of `chunkSize` words starting every `stride` words
    * (stride < chunkSize ⇒ overlap, the standard pretraining window
    * shape). Emits one row per chunk: (idCol, chunk_idx, n_chunk_tokens,
    * chunk_text). Pure per-row explode — no shuffle; at 100 TB this is
    * the scan-speed map stage in front of tokenization. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got $chunkSize/$stride")
    val base = docs.select(col(idCol),
      CorpusOps.words(col(textCol)).as("__w"))
    val n = size(col("__w"))
    // starts 1, 1+stride, …, ≤ n (last chunk may be short; none empty)
    val nChunks = when(n > 0, floor((n - 1) / stride) + 1).otherwise(0L)
    base
      .select(col(idCol), col("__w"),
        posexplode(when(nChunks > 0, sequence(lit(0L), nChunks - 1))
          .otherwise(typedlit(Array.empty[Long]))).as(Seq("__k", "__s")))
      .select(col(idCol), col("__s").as("chunk_idx"),
        slice(col("__w"), (col("__s") * stride + 1).cast("int"),
          lit(chunkSize)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** md5-uniform in [0, 1): the first 13 hex digits (52 bits — exact
    * in a double on BOTH engines; see [[Dedup.md5ChunkSql]]'s bound)
    * scaled by 16^-13. The deterministic substitute for random() in
    * every sampling decision: reproducible, growth-stable, and
    * oracle-checkable bit for bit. */
  def hashUniform(id: Column): Column =
    Dedup.md5Chunk(id.cast("string"), 1, 13).cast("double") /
      lit(math.pow(16.0, 13))

  /** Per-stratum rate sampling — the curation step that APPLIES a
    * quality stratification (CCNet keeps head/middle and downsamples
    * tail; mixture tuning downsamples over-represented sources): keep a
    * document iff its md5-uniform draw falls under its stratum's rate.
    * A pure scan-speed projection (the rates table rides the plan as a
    * literal map — strata are a handful of labels, never a scale
    * axis); deterministic, so reruns and backfills keep the SAME
    * documents, and adding corpus keeps prior decisions — the property
    * `rand() < r` sampling lacks. `defaultRate` covers unlisted
    * strata. */
  def sampleByRate(docs: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val u = hashUniform(col(idCol))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.where(u < rate)
  }

  /** Deterministic global shuffle + sharding for training order
    * (the "interleave" step that turns a curated corpus into the
    * globally-shuffled sharded dataset trainers stream): shard =
    * md5-bucket of the id, position = rank of md5(id) WITHIN the
    * shard. Output (idCol, shard, position) is a total order that is
    * uniform-random with respect to any corpus ordering (crawl date,
    * domain) yet fully reproducible. The per-shard window is the
    * honest scale shape: a shard IS the output unit (one file /
    * training stream), so `nShards` is chosen to bound shard size —
    * the window partition is bounded by design, exactly like
    * [[pack]]'s per-shard layout. */
  def interleave(docs: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val shard = pmod(Dedup.md5Chunk(col(idCol).cast("string"), 1, 13),
      lit(nShards.toLong))
    val win = Window.partitionBy(col("shard")).orderBy(col("__h"),
      col(idCol))
    docs.select(col(idCol), shard.as("shard"), h.as("__h"))
      .withColumn("position",
        row_number().over(win).cast("long"))
      .drop("__h")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006):
    * per stratum keep the k rows with the largest `u^(1/w)` keys, where
    * u is the md5-uniform draw ([[hashUniform]]) and w the row's weight —
    * exactly the reservoir-key construction, made DETERMINISTIC and
    * rerun-stable by deriving u from the id instead of rand(). The key
    * MATERIALIZED is the order-equivalent LOG form `round6(ln u) / w`
    * (exp is monotone, so the top-k set is identical): the raw power
    * compresses toward 1.0 as w grows (spread ~ |ln u|/w), so at large
    * weights (1e5+ tokens) round-6 snapping the POWER would collide
    * many keys and degrade selection to min-id tie-breaks. The snap
    * lands on ln(u) — well-spread in (−30, 0) at every weight — BEFORE
    * the division (libm log may differ at the last ulp across engines;
    * the FastRound-before-compare convention); the division itself is
    * one IEEE operation on identical inputs, bit-deterministic on both
    * engines, so the key keeps full resolution with id tie-breaks. u is
    * clamped away from 0 so ln never produces an engine-divergent
    * -inf.
    *
    * The selection itself rides [[graft.functions.TopKBy]]: a bounded
    * partial top-k aggregate whose exchange carries ≤ k rows per
    * (task, stratum) — never a per-stratum sort or window over the
    * corpus. The weighted companion of [[sampleBySource]] (uniform) and
    * [[Dsir]] (importance-weighted fraction).
    */
  def weightedSample(docs: DataFrame, idCol: String, strataCol: String,
      weight: Column, k: Int): DataFrame = {
    val key = graft.functions.FastRound(
      log(greatest(hashUniform(col(idCol)), lit(1e-300))), 6) / weight
    docs
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKBy.topkBy(key, col(idCol).cast("long"), k)
        .as("__top"))
      .select(col(strataCol),
        posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(strataCol), col("__e.id").as(idCol),
        col("__e.score").as("key"),
        (col("__pos") + lit(1)).cast("int").as("rank"))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151): the
    * principled successor of temperature sampling — given a total token
    * budget and a per-source epoch cap, small sources are repeated up to
    * the cap and the REMAINING budget is split uniformly across the
    * sources large enough to absorb it. Waterfilling over sources sorted
    * ascending by size: at each step the fair share is
    * remaining/budget ÷ remaining-sources; a source takes
    * min(cap·n_tokens, share). Because taking exactly the fair share
    * leaves the share invariant, the capped sources form an ascending
    * PREFIX — which turns the sequential loop into two window passes
    * over the per-source frame (running capped-sum + running AND),
    * engine-exact and oracle-checkable.
    *
    * Every window here runs on the per-SOURCE frame (one row per
    * source — bounded by the catalog of corpora, never by the corpus),
    * the same tiny-frame contract as [[mixtureWeights]]; the one corpus
    * pass is the map-side-combined token-count groupBy.
    *
    * Output per source: `n_tokens`, `alloc_tokens` (budgeted tokens),
    * `epochs` (= alloc/n, ≤ maxEpochs), `capped`.
    */
  def unimaxAllocation(docs: DataFrame, sourceCol: String,
      tokenCount: Column, budget: Double, maxEpochs: Double): DataFrame = {
    val asc = Window.orderBy(col("n_tokens"), col(sourceCol))
    val per = docs.groupBy(col(sourceCol))
      .agg(sum(tokenCount).as("n_tokens"))
    val ord = per
      .withColumn("_i", row_number().over(asc))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("_cum", coalesce(
        sum(col("n_tokens").cast("double") * maxEpochs)
          .over(asc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
    // capped iff every source up to and including this one fit under its
    // fair share at its turn (the running-AND of the prefix property)
    val fits = col("n_tokens").cast("double") * maxEpochs *
      (col("_m") - col("_i") + 1) <= lit(budget) - col("_cum")
    val flagged = ord.withColumn("capped",
      min(when(fits, 1).otherwise(0))
        .over(asc.rowsBetween(Window.unboundedPreceding, 0)) === 1)
    // Σ of the capped prefix, ORDER-INDEPENDENTLY: the running `_cum` is
    // already the ordered prefix sum, so the capped total is the max of
    // (_cum + own) over capped rows — an unordered double SUM here would
    // accumulate in engine-specific row order and drift at the last ulp.
    val capSum = coalesce(
      max(when(col("capped"),
        col("_cum") + col("n_tokens").cast("double") * maxEpochs))
        .over(Window.partitionBy()),
      lit(0.0))
    val share = (lit(budget) - capSum) /
      (col("_m") - sum(when(col("capped"), 1).otherwise(0))
        .over(Window.partitionBy()))
    flagged
      .withColumn("alloc_tokens",
        when(col("capped"), col("n_tokens").cast("double") * maxEpochs)
          .otherwise(share))
      .withColumn("epochs",
        when(col("capped"), lit(maxEpochs))
          .otherwise(share / col("n_tokens").cast("double")))
      .drop("_i", "_m", "_cum")
  }

  /** Temperature-scaled source mixture weights (the multilingual /
    * multi-source sampling scheme of Arivazhagan et al. 2019 §4.2 /
    * GPT-3 §2.2): weight_s ∝ (token share of source s)^alpha,
    * normalized. alpha < 1 upsamples small sources. */
  def mixtureWeights(docs: DataFrame, sourceCol: String,
      tokenCount: Column, alpha: Double): DataFrame = {
    val perSource = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
    val total = perSource.agg(sum(col("n_tokens")).as("__tot"),
      sum(pow(col("n_tokens").cast("double"), alpha)).as("__znum"))
    perSource.crossJoin(broadcast(total))
      .select(col(sourceCol), col("n_docs"),
        (col("n_tokens").cast("double") / col("__tot")).as("token_share"),
        (pow(col("n_tokens").cast("double"), alpha) / col("__znum"))
          .as("weight"))
  }
}
