package graft

import java.nio.file.{Files, Path}

/** Per-call-site temp artifact directories for the persistence-path
  * queries (q_pipeline_artifact, q_ivf_append): each invocation needs a
  * FRESH directory (append semantics make reuse incorrect), but the
  * bench harness invokes a query many times per run (warmup + two
  * shuffled passes + solo reruns) — without cleanup every invocation
  * would abandon a corpus-shard-sized parquet tree under /tmp. A Site
  * keeps at most ONE live directory: creating the next invocation's
  * dir deletes the previous one (its consumer — the query's terminal
  * action — has finished by the time the query is invoked again). */
private[graft] object TempArtifacts {

  final class Site(prefix: String) {
    private val last =
      new java.util.concurrent.atomic.AtomicReference[Path]()

    def fresh(): Path = {
      val next = Files.createTempDirectory(prefix)
      val prev = last.getAndSet(next)
      if (prev != null) deleteTree(prev)
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
