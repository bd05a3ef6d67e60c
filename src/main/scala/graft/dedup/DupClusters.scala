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
  * same loop runs with checkpointing every few rounds until a
  * convergence check — the per-round plan is identical.
  */
object DupClusters {

  /** (id, cluster) for every vertex appearing in `pairs`; cluster is the
    * min vertex id reachable within `iters` hops. */
  def minLabelClusters(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 4): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    for (_ <- 1 to iters) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("__nmin"))
      labels = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(col("cluster"), coalesce(col("__nmin"), col("cluster")))
            .as("cluster"))
    }
    labels
  }
}
