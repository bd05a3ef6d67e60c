package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005), expressed
  * RELATIONALLY: the sketch is a (depth × width) cell-count frame built
  * by ONE map-side-combined groupBy over the hashed token stream, and a
  * point estimate is the MIN over its depth rows. Because Spark's partial
  * aggregation already merges per-partition cell counts map-side, the
  * relational form IS the mergeable sketch — the exchange carries at most
  * depth·width rows per task, never the vocabulary.
  *
  * The third sketch rung next to HLL++ (TableProfile.approxDistinct) and
  * Misra-Gries (HeavyHitters): MG answers "which items are frequent",
  * CMS answers "how frequent is ANY item" in bounded space, with the
  * one-sided guarantee estimate ≥ exact (overestimates only — collisions
  * add, never subtract).
  *
  * Hashes are md5-derived (first 13 hex digits, uniform in 2^52 — the
  * CorpusSplit.hashUniform convention), so the whole sketch reproduces
  * bit-for-bit in the DuckDB oracle.
  *
  * No counterpart in the reference; LLM-data-pipeline extension
  * (SURVEY.md §7.6).
  */
object CountMin {

  /** Row-`d` bucket of `tok` in a width-`width` sketch (first 13 md5
    * hex digits of the row-salted token — the [[graft.dedup.Dedup.md5Chunk]]
    * convention). */
  def bucket(tok: Column, d: Int, width: Int): Column =
    graft.dedup.Dedup.md5Chunk(concat(lit(s"$d:"), tok), 1, 13) % width

  /** DuckDB mirror of [[bucket]] over SQL expression `tok`. */
  def bucketSql(tok: String, d: Int, width: Int): String =
    s"(${graft.dedup.Dedup.md5ChunkSql(s"md5('$d:' || $tok)", 1, 13)})" +
      s" % $width"

  /** The (d, b, cnt) sketch frame over the corpus token stream:
    * ≤ depth·width rows, partials merged map-side. */
  def sketch(docs: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame = {
    val toks = docs.select(
      explode(CorpusOps.words(col(textCol))).as("tok"))
    toks
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          bucket(col("tok"), d, width).as("b"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-distinct-token exact count, CMS estimate, and the one-sided
    * guarantee bit (always true). The estimate join touches the
    * (small) sketch frame depth times per distinct token. */
  def estimate(docs: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame = {
    val sk = sketch(docs, textCol, depth, width)
    val exact = docs
      .select(explode(CorpusOps.words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    val probes = exact.select(col("token"),
      explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          bucket(col("token"), d, width).as("b"))): _*)).as("c"))
      .select(col("token"), col("c.d").as("d"), col("c.b").as("b"))
    val est = probes.join(broadcast(sk), Seq("d", "b"))
      .groupBy(col("token")).agg(min(col("cnt")).as("cms_est"))
    exact.join(est, Seq("token"))
      .withColumn("cms_ge_exact", col("cms_est") >= col("n_exact"))
  }
}
