package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.dedup.Dedup

/** Ingest-time near-duplicate screening as a STREAM — the mode
  * [[Dedup.simHashScreen]] was designed for: every arriving micro-batch
  * of documents is simhashed, screened against the corpus ingested so
  * far, and then appended to that corpus, so each new crawl batch pays
  * |delta|-proportional work and the corpus never self-joins.
  *
  * Why `foreachBatch` and not a stateful streaming join: the "existing"
  * side is the accumulated corpus AT REST (a parquet table of 64-bit
  * simhashes — the permanent artifact an ingest pipeline maintains
  * anyway), not transient join state. Holding it in the state store
  * would duplicate the table into RocksDB and grow without bound;
  * holding it as a table keeps the STREAMING state at exactly ZERO rows
  * (asserted in the spec via `lastProgress.stateOperators`) while the
  * per-batch screen is the same banded equi-join as batch mode —
  * delta-banded × existing-banded, capped hot buckets, per-delta
  * argmin. State is data; the stream is just the loop.
  *
  * Per micro-batch: one simhash projection over the delta (map-side,
  * codegen'd), one pigeonhole-banded join against the hash table, two
  * appends (matches → `resultsDir`, delta hashes → `corpusDir`). The
  * hash table is 8 bytes + id per EVER-ingested doc — at 10B docs
  * ~100 GB of parquet, scanned bandwidth-bound per batch; partition it
  * by band prefix for pruning when batches get small.
  *
  * `corpusDir` must be seeded (possibly with an empty hash frame) —
  * the accumulated table is caller-owned state, like any warehouse
  * table a streaming job maintains.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object IngestDedup {

  /** Simhash frame (idCol, simhash) of a document batch — the schema
    * `corpusDir` holds. Exposed so callers can seed the corpus. */
  def hashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.simHash(docs, idCol, textCol)

  /** Start the screening stream over a parquet document source.
    * Matches land in `resultsDir` as (idCol, hamming, matched_id);
    * every batch's hashes land in `corpusDir` after screening.
    *
    * RESTART / REPLAY SEMANTICS: both per-batch writes are IDEMPOTENT —
    * each goes to a `batch-{batchId}` subdirectory in OVERWRITE mode, so
    * a micro-batch retried after a mid-batch crash (foreachBatch is
    * at-least-once) rewrites its own outputs instead of appending
    * duplicate hashes that would make every doc exact-match its earlier
    * copy. Pass `checkpointDir` in any production run: without a
    * checkpoint a restarted query replays EVERY source file from
    * scratch (batch ids restart at 0 — idempotence then only saves you
    * if the file-to-batch assignment is reproduced, e.g. the
    * single-file-per-trigger layout below). Read both directories with
    * `recursiveFileLookup` (see [[readAll]]). */
  def screenStream(spark: SparkSession, sourceDir: String,
      corpusDir: String, resultsDir: String, idCol: String,
      textCol: String, maxHamming: Int = 3, maxBucketSize: Int = 1000,
      maxFilesPerTrigger: Int = 1,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val step = (batch: Dataset[Row], batchId: Long) => {
      val s = batch.sparkSession
      val delta = hashes(batch.toDF(), idCol, textCol)
        .persist() // read twice: the screen and the corpus append
      try {
        val existing = readAll(s, corpusDir)
        Dedup.simHashScreen(delta, existing, idCol, "simhash",
          maxHamming, maxBucketSize)
          .write.mode("overwrite").parquet(s"$resultsDir/batch-$batchId")
        delta.write.mode("overwrite").parquet(s"$corpusDir/batch-$batchId")
      } finally delta.unpersist()
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

  /** Read an accumulated corpus/results directory — seed files at the
    * root plus the per-batch subdirectories. */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(dir)
}
