package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashBitset
import graft.sim.SemDedup
import graft.text.{Decontaminate, DupSpans}

/** Pinned-value tests for the two corpus-scale dedup extensions added in
  * round 7: SemDeDup (semantic dedup, arXiv:2303.09540) and
  * duplicated-span detection (arXiv:2107.06499). */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  test("semdedup: keep-lowest-centroid-sim priority prunes the redundant " +
    "cluster-mate, other cells untouched") {
    val emb = Seq(
      (1L, Array(1.0, 0.05)),  // cell 0, HIGHEST centroid sim → pruned
      (2L, Array(0.9, 0.10)),  // cell 0, lower centroid sim → kept keeper
      (3L, Array(0.05, 1.0)),  // cell 1, no near mate
      (4L, Array(-1.0, 0.1))   // cell 1 (closer to [0,1] than [1,0])
    ).toDF("vec_id", "embedding")
    val out = SemDedup.dedup(emb, "vec_id", "embedding", cents,
      threshold = 0.9).orderBy("vec_id").collect()
    assert(out.map(_.getAs[Int]("cell")).toSeq == Seq(0, 0, 1, 1))
    // cos(1,2) ≈ 0.998 ≥ 0.9 and csim(2) < csim(1): 1 is the duplicate
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(false, true, true, true))
    // centroid_sim really is the cosine to the OWN cell's centroid
    assert(math.abs(out(0).getAs[Double]("centroid_sim")
      - 1.0 / math.sqrt(1.0025)) < 1e-12)
  }

  test("semdedup: over-cap cells are skipped (all rows kept), and the " +
    "pairwise join never plans a cartesian product") {
    val emb = Seq(
      (1L, Array(1.0, 0.05)), (2L, Array(0.9, 0.10)),
      (3L, Array(0.05, 1.0))).toDF("vec_id", "embedding")
    val capped = SemDedup.dedup(emb, "vec_id", "embedding", cents,
      threshold = 0.9, maxCellSize = 1)
    assert(capped.where(!col("keep")).count() == 0,
      "cell 0 exceeds the cap, so its pair must be dropped, not joined")
    val plan = SemDedup.dedup(emb, "vec_id", "embedding", cents,
      threshold = 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pairwise pruning must ride the cell equi-join")
  }

  test("dup spans: cross-doc and within-doc duplicated 3-grams, token " +
    "coverage merges overlaps, short docs emit zero rows") {
    val docs = Seq(
      (1L, "a b c d e"),       // grams: [a b c][b c d][c d e]
      (2L, "x y z a b c"),     // [x y z][y z a][z a b][a b c]
      (3L, "q w"),             // shorter than k
      (4L, "m n m n m n")      // every gram duplicated within-doc
    ).toDF("doc_id", "text")
    val out = DupSpans.spanStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    def row(i: Int): (Long, Long, Long, Long, Double) =
      (out(i).getAs[Long]("n_tokens"), out(i).getAs[Long]("n_spans"),
        out(i).getAs[Long]("n_dup_spans"),
        out(i).getAs[Long]("n_dup_tokens"), out(i).getAs[Double]("dup_frac"))
    // doc 1: "a b c" (pos 1) also in doc 2 → tokens 1-3 covered
    assert(row(0) == (5L, 3L, 1L, 3L, 1.0 / 3))
    // doc 2: "a b c" at pos 4 → tokens 4-6 covered
    assert(row(1) == (6L, 4L, 1L, 3L, 0.25))
    assert(row(2) == (2L, 0L, 0L, 0L, 0.0))
    // doc 4: [m n m][n m n][m n m][n m n] — 4/4 dup, full token coverage
    assert(row(3) == (6L, 4L, 4L, 6L, 1.0))
  }

  test("dup span ranges: overlapping spans merge, back-to-back spans " +
    "merge, a genuine gap splits, bounds are 1-based inclusive") {
    val docs = Seq(
      (1L, "a b c d e"),        // dup grams at pos 1,2 → one span (1,4)
      (2L, "z a b c d"),        // dup grams at pos 2,3 → one span (2,5)
      (4L, "p q r s t u"),      // dup at 1 and 4: diff = k → back-to-back
      (6L, "p q r x s t u")     // dup at 1 and 5: diff > k → two spans
    ).toDF("doc_id", "text")
    val out = DupSpans.spanRanges(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(
      (1L, 1L, 4L, 4L),  // [a b c][b c d] overlap → tokens 1-4
      (2L, 2L, 5L, 4L),
      (4L, 1L, 6L, 6L),  // [1,3] and [4,6] are contiguous → one interval
      (6L, 1L, 3L, 3L), (6L, 5L, 7L, 3L)))
  }

  test("hash bitset: distributed build, codegen probe, 24-bit aliasing") {
    val bs = Seq(1L, 100L).toDF("h")
      .agg(HashBitset.agg(col("h"))).head.getAs[Array[Byte]](0)
    assert(bs.length == (1 << 24) / 8)
    val probe = Seq(1L, 2L, 100L, (1L << 24) + 1L).toDF("h")
      .select(col("h"), HashBitset.contains(bs, col("h")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probe(1L) && probe(100L) && !probe(2L))
    assert(probe((1L << 24) + 1L),
      "only the low 24 bits participate — prefix aliases must collide")
  }

  test("scale-path decontamination: identical results to the broadcast " +
    "form, no broadcast join, bitset prefilter ahead of the exchange") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta zeta"),
      (2L, "nothing in common here at all")
    ).toDF("doc_id", "text")
    val ev = col("doc_id") % 97 === 0
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scale = Decontaminate.overlapLargeRef(docs, "doc_id", "text", ev, 4)
    assert(rows(scale) ==
      rows(Decontaminate.overlap(docs, "doc_id", "text", ev, 4)))
    assert(rows(scale) == Set((1L, 1L)))
    val plan = scale.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "the point of the variant: nothing broadcasts but the 2 MiB bitset")
    assert(plan.contains("hash_bitset_contains"),
      "prefilter must appear in the physical plan")
  }
}
