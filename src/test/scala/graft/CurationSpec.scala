package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.RandomProjection
import graft.text.{Blocklist, SegmentDedup}

/** Round-8 curation additions: corpus-wide repeated-segment excision,
  * blocklist screening (literal ≡ data-form), and JL random projection. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("segment dedup: repeated segments excised from every doc, tail " +
    "remainder is its own segment, empty docs round-trip") {
    val docs = Seq(
      (1L, "a b c d e"),   // segs(2): [a b][c d][e]
      (2L, "a b x y"),     // segs(2): [a b][x y] — 'a b' repeats
      (3L, "")
    ).toDF("doc_id", "text")
    val out = SegmentDedup.dedup(docs, "doc_id", "text",
      segWords = 2, maxOccurrences = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (3L, 1L, "c d e"))
    assert(out(2L) == (2L, 1L, "x y"))
    assert(out(3L) == (0L, 0L, ""))
  }

  test("segment dedup: a doc whose every segment is boilerplate " +
    "empties; maxOccurrences governs the threshold") {
    val docs = Seq(
      (1L, "p q p q"), (2L, "p q p q"), (3L, "p q z z")
    ).toDF("doc_id", "text")
    // 'p q' occurs 5 times corpus-wide; with maxOccurrences = 5 it
    // survives, with 2 it dies everywhere
    val loose = SegmentDedup.dedup(docs, "doc_id", "text", 2, 5)
      .where(col("doc_id") === 1L).head()
    assert(loose.getLong(2) == 0L && loose.getString(3) == "p q p q")
    val strict = SegmentDedup.dedup(docs, "doc_id", "text", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(strict(1L) == "" && strict(2L) == "" && strict(3L) == "z z")
  }

  test("blocklist: literal and data-form paths agree, occurrence " +
    "counts (not distinct), clean and empty docs keep") {
    val docs = Seq(
      (1L, "slow slow fast"), (2L, "fast clean text"), (3L, "")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(2))).toSet
    val lit = Blocklist.screen(docs, "doc_id", "text", Seq("slow", "dup"))
    val data = Blocklist.screenDf(docs, "doc_id", "text",
      Seq("slow", "dup").toDF("term"))
    assert(rows(lit) == rows(data))
    assert(rows(lit) ==
      Set((1L, 2L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("jl projection: basis vectors read the matrix exactly; pairwise " +
    "squared distances are preserved within the JL band at k = 16") {
    val dim = 64; val k = 16
    val m = RandomProjection.matrix(k, dim)
    // e_c projects to column c of the matrix, bit for bit
    val basis = (0 until 4).map(c =>
      (c.toLong, Array.tabulate(dim)(d => if (d == c) 1.0 else 0.0)))
      .toDF("vec_id", "v")
    val pb = RandomProjection.project(basis, "vec_id", "v", k, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (c <- 0 until 4; r <- 0 until k)
      assert(pb(c.toLong)(r) == m(r)(c))
    // distance preservation: random vectors, ratio of projected to
    // original squared distance stays in a loose (k = 16) band and
    // centers near 1
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val proj = RandomProjection.project(
      vecs.toDF("vec_id", "v"), "vec_id", "v", k, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield d2(proj(i.toLong), proj(j.toLong)) /
      d2(vecs(i)._2.toSeq, vecs(j)._2.toSeq)
    assert(ratios.forall(r => r > 0.2 && r < 2.5),
      s"distortion outside the loose JL band: ${ratios.min}..${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.25, s"mean distortion $mean")
  }
}
