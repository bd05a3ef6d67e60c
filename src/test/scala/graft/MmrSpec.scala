package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Mmr

/** MMR re-rank (sim.Mmr): greedy diversification on a fixture where the
  * diversified pick provably diverges from pure relevance order. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a ≈ b (near-duplicates, both highly relevant), c relevant but in a
  // different direction: pure top-2 = (a, b); MMR λ=0.5 = (a, c)
  private val corpus = Seq(
    (1L, Array(0.99f, 0.10f, 0f, 0f)),   // a
    (2L, Array(0.98f, 0.12f, 0f, 0f)),   // b — near-dup of a
    (3L, Array(0.80f, 0f, 0.60f, 0f))    // c — diverse
  ).toDF("vec_id", "embedding")
  private val probes = Seq((100L, Array(1f, 0f, 0f, 0f)))
    .toDF("qid", "qvec")

  private def run(lambda: Double) =
    Mmr.rerank(corpus, probes, "vec_id", "embedding", "qid", "qvec",
      shortN = 3, k = 3, lambda = lambda, dim = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))

  test("diversification flips the second pick away from the near-dup; " +
    "relevance order would not") {
    val sel = run(0.5)
    assert(sel.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected a, c, b — got ${sel.toSeq}")
    // step 1 carries rel as its mmr; later steps are penalized below rel
    assert(sel(0)._3 == sel(0)._4)
    assert(sel(1)._4 < sel(1)._3 && sel(2)._4 < sel(2)._3)
    // pure relevance (λ=1) keeps the near-dup second
    assert(run(1.0).map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("deterministic across reruns and exhaustive at k = shortN " +
    "(every shortlist member selected exactly once)") {
    val a = run(0.5)
    val b = run(0.5)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).toSet == Set(1L, 2L, 3L))
    assert(a.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("k > shortN is rejected") {
    intercept[IllegalArgumentException] {
      Mmr.rerank(corpus, probes, "vec_id", "embedding", "qid", "qvec",
        shortN = 2, k = 3, lambda = 0.5, dim = 4)
    }
  }

  test("shortlist-frame seam: rerank over a full-probe IVF shortlist " +
    "is bit-identical to the brute-force default — any (qid, nid, " +
    "cosine, rank) producer composes") {
    val index = graft.sim.IvfCosine.assignByCentroids(corpus, "vec_id",
      "embedding", graft.sim.IvfCosine.pinnedCentroids(2, 4))
    val ivfShort = graft.sim.IvfCosine.search(index, probes, "vec_id",
      "embedding", "qid", "qvec", k = 3, nprobe = 2, dim = 4)
    val viaSeam = Mmr.rerank(ivfShort, corpus, "vec_id", "embedding",
      k = 3, lambda = 0.5, dim = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(viaSeam.toSeq == run(0.5).toSeq,
      "full-probe IVF shortlist must rerank identically to brute force")
  }

  test("large-k greedy loop (periodic checkpoint path): k = 12 over a " +
    "12-deep shortlist selects every member exactly once in finite " +
    "lineage") {
    val big = (1 to 12).map(i =>
      (i.toLong, Array(math.cos(i * 0.4).toFloat,
        math.sin(i * 0.4).toFloat, 0f, 0f))).toDF("vec_id", "embedding")
    val sel = Mmr.rerank(big, probes, "vec_id", "embedding", "qid",
      "qvec", shortN = 12, k = 12, lambda = 0.5, dim = 4).collect()
    assert(sel.length == 12)
    assert(sel.map(_.getLong(2)).toSet == (1L to 12L).toSet,
      "each shortlist member selected exactly once")
    assert(sel.map(_.getInt(1)).toSet == (1 to 12).toSet)
  }
}
