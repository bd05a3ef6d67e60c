package graft

import java.nio.file.{Files, Path}

/** Per-call-site temp artifact directories for the persistence-path
  * queries (q_pipeline_artifact, q_ivf_append, q_ivfpq_append,
  * q_index_maint): each invocation needs a FRESH directory (append
  * semantics make reuse incorrect), but the bench harness invokes a
  * query many times per run (warmup + two shuffled passes + solo
  * reruns) — without cleanup every invocation would abandon a
  * corpus-shard-sized parquet tree under /tmp.
  *
  * Deletion is deferred by ONE generation: `fresh()` deletes the
  * directory from two invocations ago, never the immediately previous
  * one. The returned DataFrames read their parquet trees LAZILY, so a
  * caller that builds the query twice before materializing the first
  * (a plan-collection sweep over all queries does exactly this) still
  * executes the first plan against a live path; by the time a THIRD
  * build happens, the first invocation's consumer has finished (the
  * bench/verify harnesses materialize between invocations). At most
  * two directories are ever live per site.
  */
private[graft] object TempArtifacts {

  final class Site(prefix: String) {
    private val live = new java.util.concurrent.atomic.AtomicReference[
      (Path, Path)]((null, null))

    def fresh(): Path = {
      val next = Files.createTempDirectory(prefix)
      val (old2, old1) = live.getAndUpdate {
        case (_, prev1) => (prev1, next)
      }
      val _ = old1 // old1 stays live one more generation
      if (old2 != null) deleteTree(old2)
      next
    }
  }

  private def deleteTree(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }
}
