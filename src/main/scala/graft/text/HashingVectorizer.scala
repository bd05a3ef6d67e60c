package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Feature-hashing vectorizer (Weinberger et al. 2009, "Feature
  * Hashing for Large Scale Multitask Learning" — scikit-learn's
  * HashingVectorizer): every document becomes a fixed-`dim` vector
  *
  *   v[b] = Σ_{tokens t, h(t) = b} s(t),   s(t) ∈ {−1, +1}
  *
  * with bucket h and sign s both md5-derived — stateless, no
  * vocabulary, no fit step, identical across engines and across
  * corpus growth. The alternate sign makes collisions cancel in
  * expectation (the paper's key trick), so hashed vectors preserve
  * inner products well enough for the downstream consumers this
  * operator exists to feed: [[graft.sim.SemDedup]] /
  * [[graft.sim.ProtoPrune]] / ANN over corpora that have no model
  * embeddings, and [[graft.sim.RandomProjection]] for further
  * compression.
  *
  * Plan shape: ONE scan-speed projection — the token array is hashed
  * once per token into a (bucket, sign) stream via `transform`, and
  * each output coordinate is a fold over that stream; zero shuffles,
  * zero joins, no explode. O(dim · tokens) work per row, the right
  * trade at the dims this feeds (16-128) because it keeps the whole
  * operator inside whole-stage codegen.
  *
  * `l2` appends an L2-normalized copy (cosine-ready; zero vectors stay
  * zero). No reference analog in dataflow form — centimators delegates
  * to sklearn vectorizers; this is that step made relational.
  */
object HashingVectorizer {

  /** (input columns) + `<out>` = array<double> of length `dim`
    * (+ `<out>_l2` when l2 = true). */
  def vectorize(docs: DataFrame, textCol: String, dim: Int,
      out: String = "hvec", l2: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    // (bucket, sign) per token: bucket from md5 digits 1-13, sign from
    // digit 14 parity — independent bits of the same digest
    val hashed = transform(CorpusOps.words(col(textCol)), t => struct(
      (Dedup.md5Chunk(t, 1, 13) % dim).as("b"),
      (Dedup.md5Chunk(t, 14, 1) % 2 * 2 - 1).cast("double").as("s")))
    val vec = transform(sequence(lit(0), lit(dim - 1)), b =>
      aggregate(col("__hs"), lit(0.0d),
        (acc, x) => acc + when(x.getField("b") === b.cast("long"),
          x.getField("s")).otherwise(0.0d)))
    val withV = docs.withColumn("__hs", hashed)
      .withColumn(out, vec).drop("__hs")
    if (!l2) withV
    else {
      val nrm = sqrt(aggregate(col(out), lit(0.0d),
        (acc, x) => acc + x * x))
      withV.withColumn(s"${out}_l2",
        when(nrm > 0.0, transform(col(out), x => x / nrm))
          .otherwise(col(out)))
    }
  }
}
