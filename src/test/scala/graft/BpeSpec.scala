package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** Merges-table BPE: hand-computed tokenization under the pinned
  * merges, the reference trainer loop on a fixture small enough to
  * verify by hand, and the trainer→tokenizer round trip. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount applies merges hierarchically, left to right, " +
    "never across word boundaries") {
    // the(1: t+h→th, th+e→the)  then(2: the|n — ' e n' never matches)
    // in(1)  and(1: a+n→an, an+d→and)  sting(2: i+n→in, in+g→ing, s+t→st)
    val df = Seq((1L, "the then in and sting")).toDF("doc_id", "text")
    val out = df.select(
      Bpe.tokenCount(col("text"), Bpe.pinnedMerges).as("n")).head()
    assert(out.getLong(0) == 7L)
  }

  test("tokenCount: empty text and no-merge symbols degrade to " +
    "character counts per word") {
    val df = Seq((1L, ""), (2L, "zz qq")).toDF("doc_id", "text")
    val out = df.orderBy("doc_id")
      .select(Bpe.tokenCount(col("text"), Bpe.pinnedMerges))
      .collect().map(_.getLong(0)).toSeq
    // no pinned merge touches z/q pairs → 2 chars each = 4 tokens
    assert(out == Seq(0L, 4L))
  }

  test("learnMerges reproduces the hand-computed reference trainer on " +
    "'aaab aaab ab' and the learned table drives tokenCount") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 2)
    // pair counts round 1: (a,a)=4 [two per 'aaab' x2] beats (a,b)=3;
    // after merging, (a,b)=3 [aa|a|b x2 + a|b] beats (aa,a)=2
    assert(merges == Seq(("a", "a"), ("a", "b")))
    val n = docs.select(Bpe.tokenCount(col("text"), merges)).head.getLong(0)
    // aaab → [aa, ab] (2) twice; ab → [ab] (1)
    assert(n == 5L)
  }

  test("learnMerges stops early when no adjacent pair repeats") {
    val docs = Seq((1L, "x y zw")).toDF("doc_id", "text")
    // (z,w) occurs once — below the >=2 support floor → zero merges
    assert(Bpe.learnMerges(docs, "doc_id", "text", 10).isEmpty)
  }
}
