package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-side data layout for shuffle-free reads: bucketed tables and
  * hive-style partitioned directories.
  *
  * The 100 TB rationale: a fact table that is joined / aggregated on the
  * same key every day should pay its shuffle ONCE, at write time.
  * `writeBucketed` persists the frame hash-partitioned into a fixed
  * bucket count (each bucket pre-sorted), so every later equi-join or
  * aggregation on the bucket key reads the layout's partitioning straight
  * from the catalog and plans with ZERO Exchange — the sort-merge join
  * and the hash aggregate both consume the scan's outputPartitioning
  * (PlanSpec pins the no-Exchange plan). `writePartitioned` is the
  * orthogonal read-side pruning axis: low-cardinality filter columns
  * become directory levels, so a predicate on them prunes whole
  * directories at planning time (PartitionFilters, not PushedFilters —
  * files that don't match are never even listed into the scan).
  *
  * The reference ships no storage layer of its own (it computes over
  * pandas/narwhals frames its caller loads), so this is part of the
  * large-scale extension surface: the ingest-side step a Spark-native
  * pipeline runs before the operators in `graft.text` / `graft.dedup`
  * rescan the corpus daily.
  */
object BucketedLayout {

  /** Persist `df` as a bucketed, per-bucket-sorted parquet table named
    * `name` with files under `path`. Buckets = `buckets` files per write
    * task's view, hashed on `key` — Spark's Murmur3 bucketing, the same
    * hash the join exchange would use, which is exactly why the exchange
    * becomes unnecessary. The in-memory catalog entry is session-scoped;
    * the files are not.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
                    name: String, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  /** Persist `df` hive-style partitioned on `partCol` (one directory per
    * value) under `path`. Reads back with `spark.read.parquet(path)` —
    * the partition column is reconstructed from directory names and
    * equality predicates on it become PartitionFilters.
    */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)

  /** Compact a small-files table into `ceil(rows / targetRowsPerFile)`
    * range-partitioned, internally sorted files at `outPath`, and return
    * the compacted frame read back.
    *
    * The daily maintenance job every streaming/incremental sink needs:
    * micro-batches and per-task writers leave thousands of KB-sized
    * files, and at 100 TB the scan's task count (and the namenode's
    * metadata) is governed by FILE count, not byte count. One range
    * exchange on `sortCol` gives globally contiguous, sorted files —
    * the layout min/max file statistics prune best (each key range maps
    * to exactly one file). Row-count-based sizing keeps the demo
    * deterministic; a byte-based production variant is the same plan
    * with `spark.sql.files.maxRecordsPerFile` derived from sampled row
    * width.
    */
  def compact(df: DataFrame, sortCol: String, targetRowsPerFile: Long,
      outPath: String): DataFrame = {
    val rows = df.count()
    val files = math.max(1L, (rows + targetRowsPerFile - 1)
      / targetRowsPerFile).toInt
    df.repartitionByRange(files, df(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outPath)
    df.sparkSession.read.parquet(outPath)
  }

  /** A per-JVM scratch root for layout demos: stable within the process
    * (re-runs overwrite in place instead of leaking), distinct across
    * concurrent bench forks.
    */
  def scratchDir(sub: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_layout_" +
      s"${ProcessHandle.current().pid()}/$sub"
    new java.io.File(d).getParentFile.mkdirs()
    d
  }
}
