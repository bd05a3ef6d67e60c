package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's stable chunk assignment: membership is a
  * pure function of the query NAME (md5 bucket), so growing the suite
  * perturbs only the bucket the new query hashes into — every other
  * chunk keeps its exact composition, and round-over-round numbers on
  * untouched code stay comparable (the round-11 q_pq_topk /
  * q_hash_embed movers were position-round-robin re-packing artifacts,
  * VERDICT r11 next-round #5). */
class BenchChunkSpec extends AnyFunSuite {

  private val names = (1 to 140).map(i => s"q_synthetic_$i")

  test("chunks partition the input and respect the cap") {
    val cap = 5
    val chunks = Bench.stableChunks(names, cap)
    assert(chunks.forall(_.size <= cap))
    assert(chunks.flatten.sorted == names.sorted)
    assert(chunks.flatten.distinct.size == names.size)
  }

  test("assignment is deterministic and order-independent") {
    val a = Bench.stableChunks(names, 5)
    val b = Bench.stableChunks(scala.util.Random.shuffle(names.toList), 5)
    assert(a == b)
  }

  test("adding a query perturbs only its own bucket's chunks") {
    val cap = 5
    val before = Bench.stableChunks(names, cap)
    val added = "q_brand_new"
    val after = Bench.stableChunks(names :+ added, cap)
    val beforeChanged = before.toSet.diff(after.toSet).flatten.toSet
    val afterChanged = after.toSet.diff(before.toSet).flatten.toSet
    // chunks outside the new query's bucket are byte-identical, so the
    // only re-chunked queries are the new one's bucket-mates
    assert(afterChanged == beforeChanged + added)
    // and that bucket is a small fraction of the suite (~n/28 members,
    // not a global re-pack)
    assert(beforeChanged.size <= 12,
      s"${beforeChanged.size} queries re-chunked — not bucket-confined")
  }
}
