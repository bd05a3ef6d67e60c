package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deduplication operators for web-scale corpus curation: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, exact n-gram Jaccard over
  * banded candidate pairs, and embedding-cosine near-dup via multi-band
  * sign-random-projection LSH. All expressed as DataFrame ops — shuffles
  * only on the candidate keys (fingerprint / band bucket / id-bucket),
  * never all-pairs.
  *
  * Hash family: every hash the operators depend on is derived from md5
  * (engine-portable — identical in Spark and DuckDB), never from
  * engine-internal hashes, so every operator is oracle-checkable
  * bit-for-bit. 64-bit values are taken as ≤60-bit chunks of the md5 hex
  * digest (a signed-long-safe range in both engines).
  *
  * Scale guards: every LSH band join is capped by bucket frequency
  * (`maxBucketSize`) — one hot bucket would otherwise join quadratically,
  * the classic web-scale dedup failure mode. Dropped buckets trade recall
  * for a hard runtime bound (standard practice; near-dup mega-clusters are
  * almost always boilerplate that exact dedup already collapses).
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object Dedup {

  /** Drop rows whose bucket holds more than `maxSize` rows.
    *
    * Counts run as a map-side-combined groupBy (a degenerate hot bucket
    * — every empty doc hashing to one key — counts in PARALLEL partial
    * aggregates), and the over-cap bucket set is by construction tiny
    * (it only holds pathological keys), so it broadcasts into a
    * LEFT ANTI join: the fact side never shuffles for the cap, and hot
    * buckets are already REMOVED before the candidate join's exchange.
    * The previous aggregate-only count window buffered the hottest
    * bucket's every row in one WindowExec task just to discard them. */
  private[graft] def capBuckets(df: DataFrame, bucketCols: Seq[String],
      maxSize: Int): DataFrame = {
    val over = df.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxSize)
      .select(bucketCols.map(c => col(c).as(s"__cap_$c")): _*)
    val cond = bucketCols.map(c => col(c) <=> col(s"__cap_$c"))
      .reduce(_ && _)
    df.join(broadcast(over), cond, "left_anti")
  }

  /** Exact dedup groups: fingerprint → (keeper = min id, group size).
    * One hash-partial-aggregated shuffle on the 128-bit fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** A 4·`len`-bit unsigned value from hex digits [start, start+len) of
    * md5(c), as a long. len ≤ 15 keeps it signed-positive. */
  def md5Chunk(c: Column, start: Int, len: Int): Column = {
    require(len <= 15, "more than 60 bits would overflow a signed long")
    conv(substring(md5(c), start, len), 16, 10).cast("long")
  }

  /** DuckDB mirror of [[md5Chunk]] over SQL expression `m` (an md5 hex
    * string): hex-digit polynomial. Digit terms are exact in doubles up to
    * len = 13 (values < 2^52); larger chunks must use the per-digit form
    * (see simHashSql) instead. */
  def md5ChunkSql(m: String, start: Int, len: Int): String = {
    require(len <= 13, "polynomial-in-double only exact below 2^52")
    s"CAST(list_sum(list_transform(generate_series(1, $len), " +
      s"j -> (strpos('0123456789abcdef', substr($m, CAST(j AS INT) + ${start - 1}, 1)) - 1)" +
      s" * (16.0 ** ($len - j)))) AS BIGINT)"
  }

  /** MinHash signatures from the portable double-hash family
    * h_i(s) = h1(s) + i·h2(s), where h1/h2 are disjoint 40-bit chunks of
    * md5(shingle) — one md5 per shingle, i ≤ 15 keeps the sum < 2^44 (no
    * overflow in either engine). Standard shingle→minhash pipeline; the
    * only shuffle is the per-doc signature aggregation. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleK: Int = 3): DataFrame = {
    require(numHashes <= 16, "h1 + i*h2 stays < 2^44 only for i <= 15")
    // Signatures fully MAP-SIDE and fully CODEGEN'D: the whole shingle →
    // md5 → h1+i·h2 → min pipeline is one native kernel
    // (functions.ShingleMinHash) — no shingle explode (the old form
    // shuffled |docs|·|shingles| rows, the dominant network cost at
    // corpus scale), no interpreted higher-order-function chain, no
    // intermediate arrays. Values are identical to the distinct-shingle
    // oracle (a min over a multiset equals the min over its set, so
    // shingle dedup is mathematically redundant for minhash).
    df.withColumn("__norm", TextFunctions.normalize(col(textCol)))
      .select(col(idCol),
        graft.functions.ShingleMinHash(col("__norm"), shingleK, numHashes)
          .as("minhash"))
  }

  /** Distinct character k-gram shingles over the normalized text —
    * the composed-expression form of the shingle pipeline, kept as the
    * reference implementation the fused kernels (ShingleMinHash,
    * SortedShingleHashes) are equality-tested against. Built via a
    * SQL-lambda `transform` (substring needs a column start offset,
    * which the Scala lambda API does not expose). With
    * `preNormalized = false` the normalization regex would re-run per
    * shingle position inside the lambda — callers should project the
    * normalized text into a column first and pass preNormalized = true. */
  def nGramShingles(textCol: String, k: Int = 3,
      preNormalized: Boolean = false): Column = {
    val t = if (preNormalized) textCol
      else s"lower(trim(regexp_replace($textCol, '\\\\s+', ' ')))"
    expr(s"array_distinct(transform(sequence(1, greatest(length($t) - ${k - 1}, 1)), " +
      s"i -> substring($t, i, $k)))")
  }

  /** LSH banding: candidate pairs whose signatures agree on at least one
    * band of `rowsPerBand` consecutive minhashes. Band bucket = md5 of the
    * "band,sig…" string (portable across engines). Buckets larger than
    * `maxBucketSize` are dropped BEFORE the self-join — the hot-bucket
    * guard that keeps one popular bucket from joining quadratically.
    * Returns (idA, idB) distinct pairs, idA < idB. */
  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int = 16,
      rowsPerBand: Int = 4, maxBucketSize: Int = 1000): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // materialize (id, minhash) ONCE — numHashes longs/doc: its lineage
    // (scan + normalize + shingle + minhash kernel) has THREE consumers
    // (capBuckets' bucket census + both self-join sides), and exchange
    // reuse does not cover the census' broadcast subtree (measured: the
    // signature kernel ran twice — the two dominant twin stages of the
    // whole pair build). Same trade as simHashNearDups' (id, hash)
    // checkpoint; the band explode below is a trivial projection that
    // can re-run per consumer.
    val sigsC = sigs.select(col(idCol), col("minhash")).localCheckpoint()
    // Explode the band INDEX first and build the key ABOVE the Generate:
    // an explode(array(keyExprs…)) generator is one expression tree with
    // no named intermediates, so the optimizer collapses the staged
    // signature projections into it and re-evaluates the whole minhash
    // chain per band key (measured 25× slower). With the index exploded,
    // the signature array crosses the Generate boundary as a column and
    // is computed once per document.
    val withB = sigsC.select(col(idCol), col("minhash"),
      explode(sequence(lit(0), lit(numBands - 1))).as("__b"))
    val key = md5(concat_ws(",", col("__b") +: (0 until rowsPerBand).map(r =>
      element_at(col("minhash"), col("__b") * rowsPerBand + r + 1)): _*))
    val bands = withB.select(col(idCol), key.as("bucket"))
    val capped = capBuckets(bands, Seq("bucket"), maxBucketSize)
    val a = capped.as("a"); val b = capped.as("b")
    // merge hint: the self-join must never broadcast (both sides are the
    // full banded corpus at scale); both aliases share one subtree, so
    // the SMJ's bucket exchange is computed once and reused
    a.hint("merge").join(b, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of shingle sets for candidate pairs produced
    * by banding on id ranges (|idA − idB| ≤ bandWidth). The banding is an
    * EQUI-join on bucket = id/bandWidth (each doc joins its own and the
    * next bucket) — never a nested-loop range join. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      bandWidth: Int = 20, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    // shingle sets as SORTED distinct 64-bit hashes from ONE codegen'd
    // kernel (shingle → md5 → long → sort → dedup fused, no interpreted
    // HOF chain): set intersection becomes an allocation-free two-pointer
    // merge per pair (sorted_intersect_size — the sort runs once per doc,
    // the merge once per candidate pair); Jaccard is unchanged under any
    // injective hash (~2^-64 collision odds)
    // NOT checkpointed, unlike the minhash/simhash signature kernels
    // (r14): tried and REVERTED in r15 — the kernel does run once per
    // SMJ side (twin 32-task stages, 8.8s + 4.9s exec at sf0.1), but a
    // localCheckpoint of (id, sh) re-serializes the PAYLOAD-sized
    // hash arrays through the block store (total stage exec rose
    // 20.1s → 27.2s, wall flat 1.50 → 1.44s). The minhash precedent
    // wins because its signature is 16 longs/doc; here sh is one long
    // per token — recomputing the kernel is cheaper than an extra
    // materialization round-trip of the same bytes.
    val withSh = df
      .withColumn("__norm", TextFunctions.normalize(col(textCol)))
      .select(col(idCol).as("id"),
        graft.functions.SortedShingleHashes(col("__norm"), k).as("sh"))
    val buckets = withSh.select(col("id"), col("sh"), explode(array(
      (col("id") / bandWidth).cast("long"),
      (col("id") / bandWidth).cast("long") + 1)).as("bucket"))
    val right = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"),
      (col("id") / bandWidth).cast("long").as("bucket"))
    // merge-join hint, twice deliberate: (a) scan-size stats undercount
    // the exploded shingle side, so the planner would BROADCAST it — a
    // driver-side collect of every shingle set, unusable at corpus
    // scale; (b) the SMJ's exchanges materialize the shingle arrays
    // ONCE per doc, where the broadcast plan would inline the
    // (non-codegen HOF) shingle construction into the join stage and
    // re-derive it per candidate pair
    buckets.hint("merge").join(right, Seq("bucket"))
      .where(col("id") < col("id_b") && col("id_b") - col("id") <= bandWidth)
      // size-ratio prune BEFORE the set intersection: |A∩B| ≤ min(|A|,|B|),
      // so J ≥ t already forces min/max ≥ t — a cheap scalar test that
      // skips the O(|A|+|B|) intersection for size-mismatched pairs
      // (semantics-preserving: pruned pairs can never reach the threshold)
      .where(least(size(col("sh")), size(col("sh_b"))).cast("double")
        >= lit(threshold) * greatest(size(col("sh")), size(col("sh_b"))))
      // intersection computed once, then reused for the union size
      .withColumn("__i",
        graft.functions.SortedIntersectSize(col("sh"), col("sh_b"))
          .cast("double"))
      .select(col("id").as("id_a"), col("id_b"),
        (col("__i") / (size(col("sh")) + size(col("sh_b")) - col("__i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** 60-bit SimHash over BPE-ish tokens: per-bit majority vote of md5
    * token hashes (15 hex digits × 4 bits). Pure aggregation (explode →
    * groupBy id), no UDF, engine-portable. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fused per-row kernel (functions.SimHash64): no token explode, no
    // per-doc aggregation shuffle — value-identical to the explode +
    // 60-CASE-aggregate formulation (and the DuckDB oracle mirror).
    // Token-less docs are dropped, as the explode+groupBy form did.
    df.select(col(idCol), regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9_]+"), lit(0)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        graft.functions.SimHash64(col("__toks")).as("simhash"))
  }

  /** SimHash near-duplicate pairs: candidates whose 60-bit simhashes
    * differ by ≤ `maxHamming` bits. Pigeonhole banding — the hash splits
    * into `maxHamming + 1` chunks, and any pair within the radius must
    * agree EXACTLY on at least one chunk — turns the similarity join into
    * an equi-join on (chunk index, chunk value); the exact
    * `bit_count(a XOR b)` check runs on candidates only. Same hot-bucket
    * cap as every band join. */
  /** Ingest-time near-duplicate SCREENING: for every `delta` row, the
    * closest `existing` row within `maxHamming` bits (or no row — clean
    * rows simply don't appear). The shape every production pipeline
    * needs daily: a new crawl batch checked against the corpus already
    * ingested, without ever re-joining the corpus against itself.
    *
    * Same pigeonhole banding as [[simHashNearDups]], but the equi-join is
    * delta-banded × existing-banded — the big existing side shuffles on
    * the SAME (chunk, value) keys as a self-join would, while the pair
    * count is |delta|-proportional. No first-matching-chunk dedup is
    * needed: the per-delta argmin over (hamming, existing id) absorbs
    * multi-chunk candidate duplicates for free. Output: (idCol, hamming,
    * matched_id). */
  def simHashScreen(delta: DataFrame, existing: DataFrame, idCol: String,
      hashCol: String = "simhash", maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 60
    val base = bits / chunks
    val extra = bits % chunks
    val offsets = (0 until chunks).scanLeft(0)((acc, i) =>
      acc + base + (if (i < extra) 1 else 0))
    def banded(hashes: DataFrame): DataFrame = {
      val keys = (0 until chunks).map { ci =>
        val width = offsets(ci + 1) - offsets(ci)
        val chunk = shiftright(col(hashCol), offsets(ci))
          .bitwiseAND((1L << width) - 1)
        struct(lit(ci).as("ci"), chunk.as("cv"))
      }
      capBuckets(hashes.select(col(idCol).as("id"), col(hashCol).as("h"),
        explode(array(keys: _*)).as("k"))
        .select(col("id"), col("h"), col("k.ci").as("ci"),
          col("k.cv").as("cv")), Seq("ci", "cv"), maxBucketSize)
    }
    val d = banded(delta)
    val e = banded(existing)
    d.as("a").join(e.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv"))
      .select(col("a.id").as("id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long")
          .as("hamming"),
        col("b.id").as("matched_id"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("id"))
      .agg(min(struct(col("hamming"), col("matched_id"))).as("__m"))
      .select(col("id").as(idCol), col("__m.hamming").as("hamming"),
        col("__m.matched_id").as("matched_id"))
  }

  def simHashNearDups(hashes: DataFrame, idCol: String,
      hashCol: String = "simhash", maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 60
    val base = bits / chunks
    val extra = bits % chunks // first `extra` chunks get one more bit
    val offsets = (0 until chunks).scanLeft(0)((acc, i) =>
      acc + base + (if (i < extra) 1 else 0))
    val keys = (0 until chunks).map { ci =>
      val width = offsets(ci + 1) - offsets(ci)
      val chunk = shiftright(col("h"), offsets(ci))
        .bitwiseAND((1L << width) - 1)
      struct(lit(ci).as("ci"), chunk.as("cv"))
    }
    // materialize (id, hash) ONCE — 16 bytes/doc: its lineage (scan +
    // per-doc simhash kernel) has THREE consumers (capBuckets' bucket
    // census + both self-join sides), and exchange reuse across them is
    // plan-shape-fragile (measured NOT firing — the scan and simhash
    // kernel ran twice, the dominant cost of the whole pair build); the
    // downstream band explode is a trivial ×(maxHamming+1) projection
    // that can re-run per consumer
    val hs = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .localCheckpoint()
    val banded = hs.select(col("id"), col("h"),
      explode(array(keys: _*)).as("k"))
      .select(col("id"), col("h"), col("k.ci").as("ci"), col("k.cv").as("cv"))
    val capped = capBuckets(banded, Seq("ci", "cv"), maxBucketSize)
    // Self-join both sides from the SAME checkpointed leaf:
    val diff = col("a.h").bitwiseXOR(col("b.h"))
    // First-matching-chunk rule instead of a distinct() over the candidate
    // set: a pair within the radius can agree on several chunks, so keep
    // only the occurrence whose chunk index is the smallest AGREEING one
    // (all earlier chunks must differ). Same result set, but dedup becomes
    // a per-row filter instead of one more full shuffle of the pairs.
    val firstMatch = (0 until chunks).map { ci =>
      val earlierDiffer = (0 until ci).map { j =>
        val w = offsets(j + 1) - offsets(j)
        shiftright(diff, offsets(j)).bitwiseAND((1L << w) - 1) =!= 0L
      }.foldLeft(lit(true))(_ && _)
      col("a.ci") === ci && earlierDiffer
    }.reduce(_ || _)
    capped.as("a").hint("merge").join(capped.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .where(firstMatch)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(diff).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Deterministic ±1 hyperplane weight for SRP bucketing, derived from
    * md5 of "(band,plane,dim)" — identical constants are emitted as
    * literals into both the Spark plan and the DuckDB oracle. */
  def srpWeight(band: Int, plane: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$band:$plane:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  /** Band key for one SRP band: "b:" + sign bits of `planes` hyperplane
    * dot products. The weight matrix is ONE array literal (not planes×dim
    * unrolled terms — that breaks whole-stage codegen's method-size limit
    * and bloats every task binary with the plan); each plane dot runs
    * through the native VecDot kernel, whose index-ascending loop is the
    * identical IEEE order as the SQL mirror's explicit chain. */
  private def srpBandKey(v: Column, dim: Int, band: Int, planes: Int): Column = {
    val w = typedlit((0 until planes).map(p =>
      (0 until dim).map(d => srpWeight(band, p, d)).toArray).toArray)
    val bits = (0 until planes).map { p =>
      val dot = Similarity.dot(v, element_at(w, p + 1))
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(lit(s"$band:") +: bits: _*)
  }

  /** DuckDB mirror of [[srpBandKey]] over a DOUBLE[] expression `e`. */
  def srpBandKeySql(e: String, dim: Int, band: Int, planes: Int): String = {
    val bits = (0 until planes).map { p =>
      val dot = (0 until dim).map { d =>
        s"$e[${d + 1}] * ${srpWeight(band, p, d)}"
      }.mkString(" + ")
      s"(CASE WHEN $dot >= 0 THEN '1' ELSE '0' END)"
    }
    (s"'$band:'" +: bits).mkString("concat(", ", ", ")")
  }

  /** Embedding-cosine near-duplicate pairs via MULTI-BAND
    * sign-random-projection LSH: `bands` independent bands of
    * `planesPerBand` hyperplanes each; a pair is a candidate if it shares
    * any band bucket; exact cosine (pre-normalized — self-norms computed
    * once per row, the pair check is a single dot) inside buckets only.
    *
    * Recall/cost knobs: more planes per band → smaller buckets (cost ↓,
    * recall ↓); more bands → recall ↑ linearly in cost. SRP collision
    * probability per plane is 1 − θ/π, so worst-case recall at the
    * threshold itself is 1 − (1 − p^planes)^bands with p = 1 −
    * acos(threshold)/π; the 8×12 default gives ≥ 0.92 at cosine 0.95
    * (pinned by the planted-pair recall test), where the previous 4×16
    * bottomed out near 0.55 at the knife edge. `maxBucketSize` hard-
    * bounds the quadratic in-bucket join either way. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, bands: Int = 8, planesPerBand: Int = 12,
      threshold: Double = 0.95, maxBucketSize: Int = 1000): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(Similarity.dotExpr(col(vecCol), col(vecCol), dim)).as("nrm"))
    // the SRP band keys are the expensive per-row kernel (bands ×
    // planesPerBand dim-length dots per vector), and the keyed frame
    // has three consumers (capBuckets' census + both self-join sides)
    // whose shared lineage exchange reuse does not fully cover
    // (measured: the kernel ran twice). Materialize ONLY the small
    // (id, bucket) pairs — bands × ~24 bytes/doc, never the vectors —
    // and re-attach vectors by one id equi-join afterwards: the kernel
    // runs exactly once, and the checkpoint stays proxy-sized at any
    // corpus scale (guide §8: shuffle/materialize keys, not payloads).
    val keyed = df.select(col(idCol).as("id"),
      explode(array((0 until bands).map(b =>
        srpBandKey(col(vecCol), dim, b, planesPerBand)): _*)).as("bucket"))
      .localCheckpoint()
    val capped = capBuckets(keyed, Seq("bucket"), maxBucketSize)
      .join(base, Seq("id"))
    val right = capped.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("nrm_b"), col("bucket"))
    capped.hint("merge").join(right, Seq("bucket"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        (Similarity.dotExpr(col("v"), col("v_b"), dim)
          / (col("nrm") * col("nrm_b"))).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}

/** Cosine similarity over Array[Float]/Array[Double] columns, built on
  * the native codegen'd [[graft.functions.VecDot]] kernel (index-ascending
  * accumulation — numerically identical to the explicit left-associated
  * chain the DuckDB oracles write, see VecDot's scaladoc). Callers
  * computing many pairwise similarities should project each side's
  * self-norm ONCE (`sqrt(dot(v, v))`) and divide dots by the norm
  * product — never recompute self-norms per pair. */
object Similarity {
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  /** Dot with a documented fixed layout — the kernel reads the runtime
    * length; `dim` documents the table contract at the call site. */
  def dotExpr(a: Column, b: Column, dim: Int): Column = dot(a, b)

  /** DuckDB mirror: explicit left-associated chain over DOUBLE[]
    * expressions (the IEEE-identical form of the kernel's loop). */
  def dotExprSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"$a[$i] * $b[$i]").mkString(" + ")

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
