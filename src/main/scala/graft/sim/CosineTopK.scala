package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Similarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exactness baseline: probe set × corpus via a
  * BROADCAST of the (small) probe side — the corpus never shuffles, the
  * dot products run map-side in one codegen stage, and the per-probe top-k
  * is a window over the probe key. Self-norms are projected ONCE per side
  * (never recomputed per pair), and the fixed-dimension dot expands to an
  * explicit codegen'd multiply-add chain. At 1000 executors this scales
  * linearly in corpus size as long as the probe set stays broadcastable;
  * for corpus×corpus workloads use [[graft.dedup.Dedup.embeddingNearDups]]
  * (multi-band sign-random-projection LSH) as the scale path.
  */
object CosineTopK {

  /** Exact top-k cosine neighbors for each probe row.
    * @param probes (qid, qvec) — must be broadcastable
    * @param corpus (id, vec)
    * @param dim    embedding dimensionality (fixed per table)
    */
  def bruteForce(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String, k: Int,
      dim: Int): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      sqrt(Similarity.dotExpr(col(vecCol), col(vecCol), dim)).as("__cn"))
    val p = probes.select(col(qidCol), col(qvecCol),
      sqrt(Similarity.dotExpr(col(qvecCol), col(qvecCol), dim)).as("__qn"))
    val joined = c.crossJoin(broadcast(p))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("nid"),
        (Similarity.dotExpr(col(qvecCol), col(vecCol), dim)
          / (col("__qn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
