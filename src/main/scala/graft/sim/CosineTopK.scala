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
  * is a window over the probe key. At 1000 executors this scales linearly
  * in corpus size as long as the probe set stays broadcastable; for
  * corpus×corpus workloads use [[graft.dedup.Dedup.embeddingNearDups]]
  * (sign-random-projection LSH buckets) as the scale path.
  */
object CosineTopK {

  /** Exact top-k cosine neighbors for each probe row.
    * @param probes (qid, qvec) — must be broadcastable
    * @param corpus (id, vec)
    */
  def bruteForce(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(probes))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("nid"),
        Similarity.cosine(col(qvecCol), col(vecCol)).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
