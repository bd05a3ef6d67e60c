package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deduplication operators for web-scale corpus curation: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, and exact n-gram Jaccard
  * over banded candidate pairs. All expressed as DataFrame ops — shuffles
  * only on the candidate keys (fingerprint / band hash / id-bucket), never
  * all-pairs.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object Dedup {

  /** Exact dedup groups: fingerprint → (keeper = min id, group size).
    * One hash-partial-aggregated shuffle on the 128-bit fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** MinHash signatures: explode shingles, take per-seed min of a seeded
    * 64-bit hash (xxhash64 — deterministic, codegen'd). Standard
    * shingle→minhash→band→bucket-join pipeline; the only shuffles are the
    * doc-id re-aggregation and the band-bucket join. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleK: Int = 3): DataFrame = {
    // explode 64-bit shingle hashes, not strings: cheaper rows, and
    // xxhash64(seed, shingleHash) is as good a hash family as hashing
    // the string per seed
    val sh = df
      .withColumn("__norm", TextFunctions.normalize(col(textCol)))
      .select(col(idCol), explode(nGramShingles("__norm", shingleK,
        preNormalized = true, hashed = true)).as("sh"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("minhash"))
  }

  /** Distinct character k-gram shingles over the normalized text. Built
    * via a SQL-lambda `transform` (substring needs a column start offset,
    * which the Scala lambda API does not expose). With
    * `preNormalized = false` the normalization regex would re-run per
    * shingle position inside the lambda — callers should project the
    * normalized text into a column first and pass preNormalized = true. */
  def nGramShingles(textCol: String, k: Int = 3,
      preNormalized: Boolean = false, hashed: Boolean = false): Column = {
    val t = if (preNormalized) textCol
      else s"lower(trim(regexp_replace($textCol, '\\\\s+', ' ')))"
    val elem = if (hashed) s"xxhash64(substring($t, i, $k))"
      else s"substring($t, i, $k)"
    expr(s"array_distinct(transform(sequence(1, greatest(length($t) - ${k - 1}, 1)), " +
      s"i -> $elem))")
  }

  /** LSH banding: candidate pairs whose signatures agree on at least one
    * band of `rowsPerBand` consecutive minhashes. Returns (idA, idB)
    * distinct pairs, idA < idB. */
  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = sigs.select(col(idCol), posexplode(
      array((0 until numBands).map(b =>
        struct(lit(b).as("band"),
          slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand)
            .as("sig"))): _*)).as(Seq("pos", "bs")))
      .select(col(idCol), hash(col("bs")).as("bucket"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
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
    // shingle sets as 64-bit hashes: set intersection compares longs,
    // not strings; Jaccard is unchanged up to ~2^-64 collision odds
    val withSh = df
      .withColumn("__norm", TextFunctions.normalize(col(textCol)))
      .select(col(idCol).as("id"),
        nGramShingles("__norm", k, preNormalized = true, hashed = true)
          .as("sh"))
    val buckets = withSh.select(col("id"), col("sh"), explode(array(
      (col("id") / bandWidth).cast("long"),
      (col("id") / bandWidth).cast("long") + 1)).as("bucket"))
    val right = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"),
      (col("id") / bandWidth).cast("long").as("bucket"))
    buckets.join(right, Seq("bucket"))
      .where(col("id") < col("id_b") && col("id_b") - col("id") <= bandWidth)
      // intersection computed once, then reused for the union size
      .withColumn("__i",
        size(array_intersect(col("sh"), col("sh_b"))).cast("double"))
      .select(col("id").as("id_a"), col("id_b"),
        (col("__i") / (size(col("sh")) + size(col("sh_b")) - col("__i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** 64-bit SimHash over BPE-ish tokens: per-bit majority vote of token
    * hashes. Pure aggregation (explode → groupBy id), no UDF. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(regexp_extract_all(
      lower(col(textCol)), lit("[a-z0-9_]+"), lit(0))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b"))
    toks.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs via sign-random-projection
    * bucketing: `planes` deterministic pseudo-random hyperplanes (derived
    * from xxhash64 of (plane, dim) — no RNG state), bucket = sign bits;
    * exact cosine check inside buckets only. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 8, threshold: Double = 0.95): DataFrame = {
    // plane weights in {-1, +1} from a deterministic hash of (p, d)
    val sigBits = (0 until planes).map { p =>
      val dot = (0 until dim).map { d =>
        val w = when(xxhash64(lit(p * 10007 + d)) % 2 === 0, 1.0)
          .otherwise(-1.0)
        element_at(col(vecCol), d + 1).cast("double") * w
      }.reduce(_ + _)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sigBits.reduce(_.bitwiseOR(_)).as("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("v_b"),
      col("bucket"))
    bucketed.join(b, Seq("bucket"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        Similarity.cosine(col("v"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}

/** Cosine similarity over Array[Float]/Array[Double] columns as a pure
  * fold expression — identical accumulation order to the DuckDB oracle's
  * list_inner_product-style formula. */
object Similarity {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
