package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for CPU-bound kernels over unsplittable inputs.
  *
  * A parquet scan parallelizes at ROW-GROUP granularity: a file written
  * as one row group is one task no matter what
  * `spark.sql.files.maxPartitionBytes` says. For I/O-light queries that
  * is irrelevant, but the text kernels (shingle-minhash signatures,
  * n-gram sets, simhash, tokenizer-based quality stats) do real CPU per
  * row — on a one-row-group documents table the whole kernel runs in a
  * single task while the other 31 cores idle (measured: the LSH dedup
  * queries drop ~2x with a redistribute).
  *
  * `cpuBound` inserts one round-robin exchange ONLY when the scan's
  * natural split count is below the session's default parallelism — the
  * guard makes it a no-op on realistically laid-out data (at 100 TB
  * inputs arrive as thousands of row groups and the exchange would be
  * pure waste, so it is skipped). This is the standard Spark pattern
  * for "small unsplittable input feeding expensive per-row compute".
  */
object ParallelInput {
  def cpuBound(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the scan (file listing) but runs no job
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Run independent Spark actions concurrently from a bounded pool
    * (guide §2.6 "overlap independent jobs"): a maintenance protocol
    * that issues its writes/counts sequentially leaves the cluster idle
    * through each job's scheduling tail. Callers must guarantee the
    * thunks touch DISJOINT outputs and share no uncached lineage whose
    * double execution would be wrong. Exceptions propagate (first
    * failing thunk, after all complete or fail). */
  private[graft] def overlap(thunks: Seq[() => Unit]): Unit =
    if (thunks.size <= 1) thunks.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, thunks.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val fs = thunks.map(t => scala.concurrent.Future(t()))
        fs.foreach(scala.concurrent.Await.result(_,
          scala.concurrent.duration.Duration.Inf))
      } finally pool.shutdown()
    }
}
