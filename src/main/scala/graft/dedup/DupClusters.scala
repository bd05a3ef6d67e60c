package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster assignment: connected components over a
  * candidate-pair edge list by synchronous min-label propagation.
  *
  * Dedup pipelines need a REPRESENTATIVE per duplicate group, not just
  * pairs (keep the row whose id equals the cluster label, drop the
  * rest). Label propagation is the scale-native form: each round every
  * vertex takes the min label over itself and its neighbors — one
  * shuffle per round, no driver-side graph. A fixed `iters` budget keeps
  * the computation deterministic and SQL-mirrorable; near-dup components
  * are short-diameter in practice (stars around a template), so a small
  * budget converges them. For adversarially long chains at 100 TB the
  * same loop runs with a convergence check — the per-round plan is
  * identical.
  *
  * Each round references the previous labels twice (self + neighbor
  * side), so the lazy lineage re-expands 2^iters copies of the edge
  * derivation — the iterative-algorithm trap. persist() alone does NOT
  * fix it: cache substitution happens after analysis, so the driver
  * still analyzes the exponentially nested logical plan each round
  * (measured: rounds got progressively slower on cached tiny data).
  * localCheckpoint is the real fix — it truncates the plan to a leaf,
  * keeping per-round analysis cost constant (the standard Pregel/
  * GraphFrames shape). Blocks from a previous invocation are released
  * on the next call, mirroring EraSolver.scaleGlobal's queue.
  */
object DupClusters {

  private val liveCaches =
    graft.operators.GraftTransformer.newCacheQueue()

  /** (id, cluster) for every vertex appearing in `pairs`; cluster is the
    * min vertex id reachable within `iters` hops. */
  def minLabelClusters(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 4): DataFrame = {
    liveCaches.release()
    def keep(df: DataFrame): DataFrame =
      liveCaches.keep(df.localCheckpoint(eager = true))
    // cache the PAIR LIST (one run of the upstream candidate query);
    // the bidirectional edge view is two cheap projections of the cache
    val p0 = keep(pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val edges = p0.union(p0.select(col("dst").as("src"),
      col("src").as("dst")))
    var labels = keep(edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")))
    for (_ <- 1 to iters) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("__nmin"))
      labels = keep(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id"),
            least(col("cluster"), coalesce(col("__nmin"), col("cluster")))
              .as("cluster")))
    }
    labels
  }
}
