package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{CosineTopK, HardNegatives, IvfCosine, SemDecontam}

/** Contrastive-data mining operators: hard negatives (label filter +
  * false-negative band + per-anchor top-k, DPR recipe) and embedding
  * decontamination (broadcast eval, map-side struct-max per corpus id).
  * Pins fixture semantics, the IVF-shortlist composition equality, the
  * anti-join clean() contract, and the decontam plan shape. */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DIM = 4
  // unit-ish vectors engineered so anchor 0 (label 0) sees:
  //   id 1 (label 0)  cos 1.0   — same label, excluded
  //   id 2 (label 1)  cos ~.999 — different label but inside the
  //                               false-negative band, excluded
  //   id 3 (label 1)  cos ~.71  — the true hardest negative
  //   id 4 (label 2)  cos 0.0   — a weak negative
  private def fx = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(1f, 0f, 0f, 0f), 0),
    (2L, Array(1f, 0.04f, 0f, 0f), 1),
    (3L, Array(1f, 1f, 0f, 0f), 1),
    (4L, Array(0f, 0f, 1f, 0f), 2)
  ).toDF("vec_id", "embedding", "label")

  private def anchors(df: org.apache.spark.sql.DataFrame) =
    df.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))

  test("label filter, false-negative band, and rank order on a pinned " +
    "fixture") {
    val out = HardNegatives.mine(fx, anchors(fx), "vec_id", "embedding",
      "label", "qid", "qvec", "qlabel", k = 3, dim = DIM, maxCos = 0.99)
      .select("nid", "rank").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(out.toSeq == Seq(3L -> 1, 4L -> 2),
      "same-label 1 and in-band 2 must be excluded; 3 outranks 4")
  }

  test("k truncates; maxCos=1.0 admits the near-duplicate back in") {
    val out = HardNegatives.mine(fx, anchors(fx), "vec_id", "embedding",
      "label", "qid", "qvec", "qlabel", k = 1, dim = DIM, maxCos = 1.0)
      .select("nid").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L),
      "with the band open the near-dup is the (poisonous) top negative")
  }

  test("IVF shortlist composition: full-probe IVF scored pairs mine the " +
    "same negatives as the brute path on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anc = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val brute = HardNegatives.mine(emb, anc, "vec_id", "embedding",
      "label", "qid", "qvec", "qlabel", k = 3, dim = 64, maxCos = 0.40)
    // IVF at full probe (nprobe = nlist) is exact; join labels onto the
    // (qid, nid, cosine) shortlist and run the same mining head.
    // Shortlist depth must cover k + everything the filters may drop.
    val idx = IvfCosine.assignByCentroids(emb, "vec_id", "embedding",
      IvfCosine.pinnedCentroids(8, 64))
    val short = IvfCosine.search(idx, anc.select("qid", "qvec"),
      "vec_id", "embedding", "qid", "qvec", k = 500, nprobe = 8, dim = 64)
      .select(col("qid"), col("nid"),
        graft.functions.FastRound(col("cosine"), 6).as("cosine"))
    val scored = short
      .join(emb.select(col("vec_id").as("nid"),
        col("label").as("nlabel")), "nid")
      .join(anc.select(col("qid"), col("qlabel")), "qid")
    val viaIvf = HardNegatives.fromScored(scored, k = 3, maxCos = 0.40)
      .select("qid", "nid", "nlabel", "cosine", "rank")
    val b = brute.select("qid", "nid", "nlabel", "cosine", "rank")
    assert(b.exceptAll(viaIvf).isEmpty && viaIvf.exceptAll(b).isEmpty,
      "full-probe IVF mining must equal brute mining")
  }

  test("decontam: flag thresholds on max cosine, attribution is the " +
    "smallest eval id among ties, clean() drops exactly the flagged ids") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),   // cos 1.0 vs BOTH evals → tie
      (11L, Array(0f, 1f, 0f, 0f)),   // cos 0 vs both
      (12L, Array(1f, 1f, 0f, 0f))    // cos ~.71
    ).toDF("vec_id", "embedding")
    val evals = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(1f, 0f, 0f, 0f))
    ).toDF("qid", "qvec")
    val out = SemDecontam.flag(corpus, evals, "vec_id", "embedding",
      "qid", "qvec", tau = 0.9, dim = DIM)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(10L) == ((100L, 1.0, true)),
      "tie attribution must pick the smallest eval id")
    assert(out(11L)._3 == false && out(12L)._3 == false)
    val kept = SemDecontam.clean(corpus, evals, "vec_id", "embedding",
      "qid", "qvec", tau = 0.9, dim = DIM)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L),
      "clean() must drop exactly the contaminated ids, payload intact")
  }

  test("decontam plan shape: eval side broadcast, struct-max collapses " +
    "map-side (partial_max before ONE id-keyed exchange), corpus never " +
    "re-scored after the aggregate") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val evals = emb.where(col("vec_id") % 23 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val df = SemDecontam.flag(emb.where(col("vec_id") % 23 =!= 1), evals,
      "vec_id", "embedding", "qid", "qvec", tau = 0.35, dim = 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n$plan")
    assert(plan.contains("partial_max"),
      s"struct-max must collapse before the exchange:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"exactly one id-keyed exchange expected:\n$plan")
  }
}

/** The stateless decontamination screen: batch-equal to clean(), and
  * streaming-compatible (zero state operators) — the ingest-time
  * semantic-leakage companion of IngestDedup. */
class SemDecontamStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val DIM = 64
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val evals = emb.where(col("vec_id") % 23 === 1)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val corpus = emb.where(col("vec_id") % 23 =!= 1)

  test("screen() == clean(): the stateless anti-join keeps exactly the " +
    "survivors of the aggregating form") {
    val a = SemDecontam.screen(corpus, evals, "vec_id", "embedding",
      "qid", "qvec", tau = 0.35, dim = DIM).select("vec_id")
    val b = SemDecontam.clean(corpus, evals, "vec_id", "embedding",
      "qid", "qvec", tau = 0.35, dim = DIM).select("vec_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the screen genuinely drops something at this tau
    assert(a.count() < corpus.count())
  }

  test("streaming: two micro-batches screened == batch screen; ZERO " +
    "streaming state rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-semdec")
    val (srcDir, outDir) = (s"$root/src", s"$root/out")
    corpus.where(col("vec_id") < 250).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    corpus.where(col("vec_id") >= 250).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(corpus.schema).parquet(srcDir)
    val screened = SemDecontam.screen(stream, evals, "vec_id",
      "embedding", "qid", "qvec", tau = 0.35, dim = DIM)
    val q = screened.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    val state = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    q.stop()
    assert(state.forall(_.numRowsTotal == 0),
      s"the screen must be stateless, got state: ${state.toList}")
    val streamed = spark.read.parquet(outDir).select("vec_id")
    val batch = SemDecontam.screen(corpus, evals, "vec_id", "embedding",
      "qid", "qvec", tau = 0.35, dim = DIM).select("vec_id")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "stream and batch screens must keep identical survivors")
  }
}
