package graft.operators

import org.apache.spark.sql.DataFrame

/** A `DataFrame => DataFrame` pipeline stage.
  *
  * Spark-native re-expression of the reference's sklearn-transformer +
  * metadata-routing composition (reference: README.md:112-162,
  * feature_transformers/base.py:41-80): the routed side-channel series
  * (`date_series`, `ticker_series`, `era_series`) become *named columns in
  * the same DataFrame*, passed as constructor parameters. Ordering, which
  * the reference inherits implicitly from physical row order, is an explicit
  * `orderCols` parameter — Spark DataFrames are unordered by design.
  *
  * `transform` appends the transformer's output columns to the input frame
  * (the reference returns only the new columns; keeping the input columns
  * is strictly more composable and costs nothing under column pruning).
  * `outputNames` mirrors the reference's `get_feature_names_out`.
  */
trait GraftTransformer extends Serializable {
  def transform(df: DataFrame): DataFrame
  def outputNames: Seq[String]
}

/** Registry of the library's internal caches (solver outputs, iterative
  * checkpoints). Each caching call site owns a [[CacheQueue]]; queues
  * self-release the PREVIOUS invocation's blocks when a new invocation
  * starts (at most one live cache per site), and `unpersistAll()` lets a
  * library user — not just our Bench loop — release everything
  * deterministically after their terminal action, e.g. between queries in
  * a long-lived session where accumulated disk blocks are never
  * LRU-reclaimed. */
object GraftTransformer {
  /** Per-call-site queue of live cached/checkpointed frames. Draining one
    * site must not evict another site's still-referenced cache, hence
    * per-site queues rather than one global pool. */
  final class CacheQueue {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    /** Track `df` (already persisted/checkpointed) for later release. */
    def keep(df: DataFrame): DataFrame = { q.add(df); df }
    /** Release every tracked frame (non-blocking). Call at the START of a
      * new invocation (previous caller's terminal action has run by then)
      * or from [[unpersistAll]]. */
    def release(): Unit = {
      var prev = q.poll()
      while (prev != null) { prev.unpersist(blocking = false); prev = q.poll() }
    }
  }

  private val queues =
    new java.util.concurrent.ConcurrentLinkedQueue[CacheQueue]()

  private[graft] def newCacheQueue(): CacheQueue = {
    val cq = new CacheQueue
    queues.add(cq)
    cq
  }

  /** Release every cache the library is holding. Intended for after the
    * caller's terminal action. A released `persist()` frame is silently
    * recomputed if still referenced; a released `localCheckpoint` frame
    * (iterative results, e.g. dup clustering) is NOT — its lineage was
    * truncated — so re-running the producing operator is required to use
    * such a result again. */
  def unpersistAll(): Unit = queues.forEach(_.release())
}

/** Sequential composition of transformers — the whole chain stays one lazy
  * Catalyst plan, so adjacent stages sharing a partitioning key (e.g. lag +
  * moving-average over the same ticker/order spec) get a single exchange. */
case class Pipeline(stages: Seq[GraftTransformer]) extends GraftTransformer {
  def transform(df: DataFrame): DataFrame = stages.foldLeft(df)((d, t) => t.transform(d))
  def outputNames: Seq[String] = stages.flatMap(_.outputNames)
}
