package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.sources.{BucketedLayout, SnapshotDiff}

/** The STREAMING twin of q_ingest_pipeline — the daily incremental-ingest
  * composition run as a continuous query instead of a batch job:
  *
  *   file-source CDC deltas (id, text, version, op)
  *     → per-micro-batch blocklist screen (blocked UPSERTS are dropped,
  *       so the corpus keeps their last good version; tombstones pass
  *       through unscreened — a removal is not a document)
  *     → idempotent append to the merge-on-read delta LOG
  *   readers: [[SnapshotDiff.resolveLatest]](base, log) at any moment
  *   maintenance: [[compactInto]] folds the log into a new base on
  *       whatever cadence the log-to-base ratio warrants.
  *
  * Same architecture as [[IngestDedup]] and for the same reason: the
  * accumulated state (the delta log) is a caller-owned parquet table,
  * not streaming state — `foreachBatch` screens and appends, the
  * STREAMING state stays zero rows, and each batch writes to its own
  * `batch-{batchId}` subdirectory in overwrite mode so an at-least-once
  * retry rewrites instead of duplicating. With a checkpoint, a restarted
  * query resumes after the committed batches (the replay-pollution spec
  * pins this end-to-end).
  *
  * At 100 TB: per micro-batch work is delta-proportional (one scan-speed
  * blocklist projection + one bounded write); the resolve read is the
  * one map-side-combined struct-max groupBy of [[SnapshotDiff]]; the
  * base rewrite cost is paid only at compaction, by choice.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object IngestPipeline {

  /** Start the screening/appending stream over a parquet CDC-delta
    * source. Delta schema: (idCol, textCol, versionCol, opCol) — pass
    * it via `deltaSchema` to start the query on an EMPTY landing
    * directory (the normal deployment order: start the stream, then
    * let the producer write); when absent it is inferred from files
    * already present, which requires at least one. */
  def start(spark: SparkSession, sourceDir: String, logDir: String,
      idCol: String, textCol: String, versionCol: String, opCol: String,
      blocklist: Seq[String], deleteOp: String = "D",
      maxFilesPerTrigger: Int = 1,
      checkpointDir: Option[String] = None,
      deltaSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val schema = deltaSchema.getOrElse(spark.read.parquet(sourceDir).schema)
    val step = (batch: Dataset[Row], batchId: Long) => {
      screenBatch(batch.toDF(), idCol, textCol, opCol, blocklist, deleteOp)
        .write.mode("overwrite").parquet(s"$logDir/batch-$batchId")
      ()
    }
    val writer = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(step)
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** One delta batch screened: blocked upserts drop, tombstones pass.
    * Shared by the stream and the batch twin so the two paths cannot
    * drift.
    *
    * The screen is a per-ROW filter ([[graft.text.Blocklist.keepCol]]),
    * never a keep-set joined back by id: a batch may carry several
    * VERSIONS of one id, and an id-keyed join would both resurrect a
    * blocked v2 whenever a clean v1 shares the batch and duplicate the
    * rows of multi-version clean ids (IngestPipelineSpec pins both). */
  def screenBatch(delta: DataFrame, idCol: String, textCol: String,
      opCol: String, blocklist: Seq[String],
      deleteOp: String): DataFrame =
    delta.where(col(opCol) === deleteOp ||
      graft.text.Blocklist.keepCol(col(textCol), blocklist))

  /** Resolve the current table state: base + accumulated log →
    * latest row per id ([[SnapshotDiff.resolveLatest]] semantics). */
  def resolve(spark: SparkSession, base: DataFrame, logDir: String,
      idCol: String, versionCol: String, opCol: String,
      deleteOp: String = "D"): DataFrame =
    SnapshotDiff.resolveLatest(base,
      IngestDedup.readAll(spark, logDir), idCol, versionCol, opCol,
      deleteOp)

  /** Fold the log into a fresh compacted base at `outPath` (the
    * maintenance step): resolve → [[BucketedLayout.compact]]. The
    * returned frame is the new base; the caller retires the old log. */
  def compactInto(spark: SparkSession, base: DataFrame, logDir: String,
      idCol: String, versionCol: String, opCol: String,
      targetRowsPerFile: Long, outPath: String,
      deleteOp: String = "D"): DataFrame =
    BucketedLayout.compact(
      resolve(spark, base, logDir, idCol, versionCol, opCol, deleteOp)
        .drop(versionCol),
      idCol, targetRowsPerFile, outPath)
}
