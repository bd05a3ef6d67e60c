package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.{CosineTopK, IvfCosine}
import graft.dedup.Dedup

/** Similarity-search queries over the `embeddings` table (SURVEY.md §7.6).
  *
  * q_cosine_topk (brute-force baseline) carries a full DuckDB oracle: the
  * cosine formula is written with the identical fold order on both sides
  * (dot/(sqrt·sqrt) over doubles, index order). The LSH-bucketed variant
  * depends on engine hashes → rows-only + SimSpec recall test.
  */
object QueriesSim {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact top-5 cosine neighbors for the 50-vector probe set
    "q_cosine_topk" -> ((s, dir) => {
      val corpus = emb(s, dir)
      val probes = corpus.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      CosineTopK.bruteForce(corpus, probes, "vec_id", "embedding",
        "qid", "qvec", k = 5)
        .select(col("qid"), col("nid"), round(col("cosine"), 6).as("cosine"),
          col("rank"))
    }),

    // IVF ANN: k-means coarse quantizer, probes scan nprobe of nlist
    // cells — the equi-join scale path when probes don't broadcast.
    // k-means is iterative/seed-dependent → rows-only; SimSpec pins
    // recall == 1.0 at nprobe = nlist vs the brute-force baseline.
    "q_ivf_topk" -> ((s, dir) => {
      val corpus = emb(s, dir)
      val idx = IvfCosine.buildIndex(corpus, "vec_id", "embedding",
        nlist = 16)
      val probes = corpus.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      IvfCosine.search(idx, probes, "vec_id", "embedding", "qid", "qvec",
        k = 5, nprobe = 4)
        .select(col("qid"), col("nid"), round(col("cosine"), 6).as("cosine"),
          col("rank"))
    }),

    // scale path: sign-random-projection buckets + exact check in-bucket.
    // (The synthetic embeddings have no true near-dups — max pairwise
    // cosine ≈ 0.48 — so the demo threshold is 0.3.)
    "q_embed_neardup" -> ((s, dir) => {
      Dedup.embeddingNearDups(emb(s, dir), "vec_id", "embedding",
        dim = 64, planes = 6, threshold = 0.3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |p AS (SELECT vec_id AS qid, e AS q FROM v WHERE vec_id < 50),
        |sims AS (
        |  SELECT p.qid, v.vec_id AS nid,
        |    list_inner_product(p.q, v.e)
        |      / (sqrt(list_inner_product(p.q, p.q))
        |         * sqrt(list_inner_product(v.e, v.e))) AS cosine
        |  FROM p, v WHERE v.vec_id <> p.qid),
        |ranked AS (
        |  SELECT qid, nid, cosine,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, nid) AS rank
        |  FROM sims)
        |SELECT qid, nid, round(cosine, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin
  )
}
