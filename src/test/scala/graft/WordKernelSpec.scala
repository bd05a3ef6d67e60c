package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** The fused word-tokenize / word-ngram kernels equal the composed
  * forms they replaced (which the DuckDB oracles keep): word_tokens ≡
  * regexp_extract_all(lower(text), "[a-z0-9_]+", 0) and word_ngrams ≡
  * the staged transform/element_at/concat_ws chain — on randomized
  * inputs including non-ASCII (Unicode lowercasing that EXPANDS, e.g.
  * 'İ' → "i̇"), digits/underscores, empty and null cases. */
class WordKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar.map(_.toString)),
    (3, Gen.oneOf(" ", "\t", "\n", ",", ".", "-", "_", "!")),
    (1, Gen.oneOf("É", "İ", "ß", "Ω", "中", "🎉", "Ä", "и"))
  )).map(_.mkString)

  test("word_tokens ≡ regexp_extract_all(lower, '[a-z0-9_]+') on " +
    "randomized unicode text") {
    val samples = Gen.listOfN(300, textGen).sample.get ++ Seq(
      "", " ", "___", "a_b c_d", "ABC123", "İstanbul QUICK",
      "ẞharp ß", "tab\tsep", "mixed中文words", "🎉party2_time🎉")
    val df = samples.toDF("t")
    val got = df.select(
      graft.functions.WordTokens(col("t")).as("kernel"),
      regexp_extract_all(lower(col("t")), lit("[a-z0-9_]+"), lit(0))
        .as("ref"))
      .collect()
    got.zip(samples).foreach { case (r, s) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch on ${s.take(60)}: kernel=${r.getSeq[String](0)} " +
          s"ref=${r.getSeq[String](1)}")
    }
    // null text: both null
    val n = Seq(Option.empty[String]).toDF("t")
      .select(graft.functions.WordTokens(col("t")).as("kernel"),
        regexp_extract_all(lower(col("t")), lit("[a-z0-9_]+"), lit(0))
          .as("ref")).collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("word_ngrams ≡ the staged transform/element_at/concat_ws chain " +
    "for g in 1..4, incl. short arrays, empty arrays and null arrays") {
    val arrGen: Gen[Seq[String]] =
      Gen.listOf(Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
        .map(_.toSeq)
    val samples = Gen.listOfN(200, arrGen).sample.get ++ Seq(
      Seq.empty[String], Seq("solo"), Seq("a", "b"), Seq("", "x", ""))
    for (g <- 1 to 4) {
      val df = samples.toDF("w")
      val got = df.select(
        graft.text.CorpusOps.wordNgrams(col("w"), g).as("kernel"),
        graft.text.CorpusOps.wordNgramsStaged(col("w"), g).as("ref"))
        .collect()
      got.zip(samples).foreach { case (r, s) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"g=$g mismatch on $s")
      }
      // null ARRAY: both empty (the staged when-guard semantics)
      val n = Seq(Option.empty[Seq[String]]).toDF("w")
        .select(graft.text.CorpusOps.wordNgrams(col("w"), g).as("kernel"),
          graft.text.CorpusOps.wordNgramsStaged(col("w"), g).as("ref"))
        .collect()(0)
      assert(n.getSeq[String](0) == n.getSeq[String](1) &&
        n.getSeq[String](0) == Seq.empty[String], s"g=$g null-array case")
    }
  }

  test("word_token_counts ≡ explode(word_tokens) + groupBy counts on " +
    "randomized unicode text, with deterministic first-occurrence order") {
    val samples = Gen.listOfN(200, textGen).sample.get ++ Seq(
      "", " ", "a a a b b c", "___ ___", "ABC123 abc123",
      "İstanbul QUICK quick", "mixed中文words 中文")
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    // reference: occurrence counts from the staged explode + groupBy
    val ref = df.select(col("id"),
        explode(graft.functions.WordTokens(col("t"))).as("tok"))
      .groupBy("id", "tok").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val got = df.select(col("id"),
        graft.functions.WordTokenCounts(col("t")).as("tc"))
      .collect()
    var kernelPairs = 0
    got.foreach { r =>
      val id = r.getLong(0)
      val tc = r.getSeq[org.apache.spark.sql.Row](1)
      // counts match the reference exactly
      tc.foreach { e =>
        assert(ref((id, e.getString(0))) == e.getLong(1),
          s"id=$id token=${e.getString(0)}")
      }
      kernelPairs += tc.size
      // tokens are distinct within a doc
      assert(tc.map(_.getString(0)).distinct.size == tc.size)
      // deterministic first-occurrence order
      val firstSeen = graft.functions.WordTokens
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(
          samples(id.toInt))).toArray[AnyRef](
          org.apache.spark.sql.types.StringType).map(_.toString).distinct
      assert(tc.map(_.getString(0)) == firstSeen.toSeq, s"order id=$id")
    }
    assert(kernelPairs == ref.size, "kernel emits exactly the " +
      "reference's distinct (doc, token) pairs")
    // null text: null array (explode drops it, like word_tokens)
    val n = Seq(Option.empty[String]).toDF("t")
      .select(graft.functions.WordTokenCounts(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("word_ngrams handles null ELEMENTS like concat_ws (skipped " +
    "inside the gram)") {
    val df = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS w")
    val got = df.select(
      graft.text.CorpusOps.wordNgrams(col("w"), 2).as("kernel"),
      graft.text.CorpusOps.wordNgramsStaged(col("w"), 2).as("ref"))
      .collect()(0)
    assert(got.getSeq[String](0) == got.getSeq[String](1))
  }
}
