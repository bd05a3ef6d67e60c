package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{IngestDedup, IngestPipeline}

/** The streaming twin of q_ingest_pipeline (streaming.IngestPipeline):
  * CDC-delta file source → per-batch blocklist screen → idempotent
  * merge-on-read log append, resolved on read and folded by compaction.
  * Pins stream ≡ batch result equality, zero streaming state, restart
  * (including a kill while batches are still pending) without replay
  * pollution, and compaction folding the log out of the read plan. */
class IngestPipelineStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val blocklist = Seq("slow", "dup", "lorem")

  private def base = Seq(
    (1L, "clean text one"), (2L, "clean text two"),
    (3L, "clean text three"), (4L, "clean text four"))
    .toDF("doc_id", "text")

  // delta file A: edit 1, tombstone 3, add 10; file B: blocked edit of 2
  // (keeps its base version), higher-version re-edit of 1, add 11
  private def deltaA = Seq(
    (1L, "edited one v1", 1L, "U"),
    (3L, "", 1L, "D"),
    (10L, "brand new ten", 1L, "U"))
    .toDF("doc_id", "text", "version", "op")
  private def deltaB = Seq(
    (2L, "edited two with lorem inside", 2L, "U"),
    (1L, "edited one v2", 2L, "U"),
    (11L, "brand new eleven", 2L, "U"))
    .toDF("doc_id", "text", "version", "op")

  /** The batch twin over the same deltas — one screen + one resolve. */
  private def batchResolve = graft.sources.SnapshotDiff.resolveLatest(
    base,
    IngestPipeline.screenBatch(deltaA.unionByName(deltaB), "doc_id",
      "text", "op", blocklist, "D"),
    "doc_id", "version", "op")

  private def resolvedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "version", "text")
      .collect().map(_.toSeq).toSet

  test("stream == batch: two micro-batches of screened CDC deltas " +
    "resolve to exactly the batch pipeline's table, with zero " +
    "streaming state rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingpipe")
    val (src, log) = (s"$root/src", s"$root/log")
    deltaA.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtime second -> stable batch order
    deltaB.coalesce(1).write.mode("append").parquet(src)
    val q = IngestPipeline.start(spark, src, log, "doc_id", "text",
      "version", "op", blocklist, checkpointDir = Some(s"$root/ckpt"))
    q.processAllAvailable()
    val state = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    q.stop()
    val streamed = IngestPipeline.resolve(spark, base, log, "doc_id",
      "version", "op")
    assert(resolvedSet(streamed) == resolvedSet(batchResolve))
    // semantic milestones: tombstone gone, blocked edit kept its base
    // version, v2 re-edit won, both adds present
    val byId = streamed.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!byId.contains(3L))
    assert(byId(2L) == ((0L, "clean text two")))
    assert(byId(1L) == ((2L, "edited one v2")))
    assert(byId(10L)._1 == 1L && byId(11L)._1 == 2L)
    assert(state.forall(_.numRowsTotal == 0),
      s"expected zero streaming state rows, got $state")
  }

  test("kill mid-stream + restart on the same checkpoint: committed " +
    "batches never replay, pending batches complete, the resolved " +
    "table still equals the batch twin") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingkill")
    val (src, log, ckpt) = (s"$root/src", s"$root/log", s"$root/ckpt")
    // both files present BEFORE the stream starts; one file per trigger
    deltaA.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    deltaB.coalesce(1).write.mode("append").parquet(src)
    val q1 = IngestPipeline.start(spark, src, log, "doc_id", "text",
      "version", "op", blocklist, checkpointDir = Some(ckpt))
    // kill as soon as batch 0 has committed — batch 1 may be pending or
    // mid-flight; correctness must hold in either interleaving
    val deadline = System.currentTimeMillis() + 30000
    while (!q1.recentProgress.exists(p =>
        p.batchId == 0 && p.numInputRows > 0) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop()
    val q2 = IngestPipeline.start(spark, src, log, "doc_id", "text",
      "version", "op", blocklist, checkpointDir = Some(ckpt))
    q2.processAllAvailable()
    q2.stop()
    // no replay pollution: every (id, version) appears at most once in
    // the accumulated log
    val logged = IngestDedup.readAll(spark, log)
      .select("doc_id", "version").collect().map(_.toSeq).toSeq
    assert(logged.length == logged.distinct.length,
      s"log must hold no duplicated delta rows after restart: $logged")
    assert(resolvedSet(IngestPipeline.resolve(spark, base, log,
      "doc_id", "version", "op")) == resolvedSet(batchResolve))
  }

  test("compaction folds the log: resolve -> compact -> re-read equals " +
    "resolve-before-compact, the compacted read plans as a bare file " +
    "scan (no delta-log union), and later deltas resolve against the " +
    "new base") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingcomp")
    val (src, log) = (s"$root/src", s"$root/log")
    deltaA.coalesce(1).write.mode("append").parquet(src)
    val q = IngestPipeline.start(spark, src, log, "doc_id", "text",
      "version", "op", blocklist, checkpointDir = Some(s"$root/ckpt"))
    q.processAllAvailable(); q.stop()
    val before = IngestPipeline.resolve(spark, base, log, "doc_id",
      "version", "op").select("doc_id", "text")
      .collect().map(_.toSeq).toSet
    val compacted = IngestPipeline.compactInto(spark, base, log,
      "doc_id", "version", "op", targetRowsPerFile = 100L,
      outPath = s"$root/base2")
    assert(compacted.collect().map(_.toSeq).toSet == before)
    val plan = compacted.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"post-compaction read must not union the delta log:\n$plan")
    assert(plan.contains("FileScan parquet"), plan)
    // the compacted table IS the new base: a later delta log resolves
    // against it with the same semantics (version counter restarts;
    // production keeps a version watermark across compactions)
    val laterLog = s"$root/log2"
    IngestPipeline.screenBatch(
      Seq((10L, "", 1L, "D"), (12L, "brand new twelve", 1L, "U"))
        .toDF("doc_id", "text", "version", "op"),
      "doc_id", "text", "op", blocklist, "D")
      .write.parquet(s"$laterLog/batch-0")
    val after = IngestPipeline.resolve(spark, compacted, laterLog,
      "doc_id", "version", "op")
    val ids = after.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(10L) && ids.contains(12L) && ids.contains(1L))
  }
}

/** screenBatch is per-ROW (per version), never a keep-set joined back
  * by id: a clean v1 must not resurrect a blocked v2 of the same id in
  * the same batch, and multi-version clean ids must not duplicate. The
  * deployment-order contract of start() is pinned too: with an explicit
  * deltaSchema the stream starts on an EMPTY landing directory. */
class ScreenBatchRowLevelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val blocklist = Seq("lorem")

  test("same-batch clean v1 + blocked v2 of one id: only v1 survives; " +
    "multi-version clean ids keep one row per version") {
    val batch = Seq(
      (7L, "clean seven v1", 1L, "U"),
      (7L, "seven with lorem inside", 2L, "U"), // blocked — must drop
      (8L, "clean eight v1", 1L, "U"),
      (8L, "clean eight v2", 2L, "U"),          // both survive, ONCE
      (9L, "", 1L, "D")                          // tombstone passes
    ).toDF("doc_id", "text", "version", "op")
    val out = IngestPipeline.screenBatch(batch, "doc_id", "text", "op",
      blocklist, "D")
      .select("doc_id", "version", "op").collect().map(_.toSeq).toSeq
    assert(out.length == out.distinct.length, s"duplicated rows: $out")
    assert(out.toSet == Set(Seq(7L, 1L, "U"), Seq(8L, 1L, "U"),
      Seq(8L, 2L, "U"), Seq(9L, 1L, "D")),
      s"blocked v2 must drop while clean v1 survives: $out")
    // and the resolve consequence: id 7 lands at its clean v1
    val resolved = graft.sources.SnapshotDiff.resolveLatest(
      Seq((7L, "base seven")).toDF("doc_id", "text"),
      IngestPipeline.screenBatch(batch, "doc_id", "text", "op",
        blocklist, "D").where(col("doc_id") === 7),
      "doc_id", "version", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(resolved.toSeq == Seq((7L, 1L, "clean seven v1")))
  }

  test("start() on an empty landing directory with an explicit schema: " +
    "files written AFTER the stream starts are screened and logged") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingempty")
    val (src, log) = (s"$root/src", s"$root/log")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = Seq((0L, "", 0L, ""))
      .toDF("doc_id", "text", "version", "op").schema
    val q = IngestPipeline.start(spark, src, log, "doc_id", "text",
      "version", "op", blocklist, checkpointDir = Some(s"$root/ckpt"),
      deltaSchema = Some(schema))
    Seq((1L, "first ever delta", 1L, "U"),
      (2L, "has lorem so blocked", 1L, "U"))
      .toDF("doc_id", "text", "version", "op")
      .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    val logged = IngestDedup.readAll(spark, log)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(logged == Set(1L),
      "the post-start delta must be screened and logged")
  }
}
