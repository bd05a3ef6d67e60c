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

  /** Exact connected components to CONVERGENCE: alternating
    * large-star / small-star contraction (Kiveris, Lattanzi, Mirrokni,
    * Rastogi, Vassilvitskii, "Connected Components in MapReduce and
    * Beyond", SoCC 2014).
    *
    * [[minLabelClusters]] is the fixed-budget form: one hop of label
    * movement per round, so a component of diameter d needs d rounds —
    * fine for the star-shaped near-dup components it serves, wrong for
    * adversarially chained ones (a 100-hop chain at a 4-round budget
    * splits into 25 clusters and the dedup keeps 25 "representatives"
    * of one duplicate group). Star contraction instead REWIRES the graph
    * each round — large-star hangs every node's larger neighbors onto
    * its minimum, small-star collapses the smaller ones — which halves
    * long paths per round, giving O(log n) rounds on any topology with
    * per-round work proportional to the current edge count (the paper's
    * Theorems 1-2). Each round is two groupBy-min + join passes over a
    * canonical (lo, hi) edge list; nothing graph-shaped lives on the
    * driver.
    *
    * Convergence is detected EXACTLY: same edge count and no edge in
    * E' \ E (a LEFT ANTI probe capped at one row) — two tiny jobs per
    * round against localCheckpoint'ed leaves (same lineage-truncation
    * rationale as [[minLabelClusters]]). At the fixpoint the edge list
    * IS the component map: every edge is (root, member) with root the
    * component-minimum id.
    *
    * No reference analog (the reference has no graph component); this is
    * the scale path behind q_dup_clusters' fixed-budget oracle form.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    liveCaches.release()
    def keep(df: DataFrame): DataFrame =
      liveCaches.keep(df.localCheckpoint(eager = true))
    // canonical (lo, hi) pairs; self-loops dropped
    var e = keep(pairs
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .where(col("lo") =!= col("hi")).distinct())
    var eCount = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      // large-star: sym view; m(u) = min(u, min N(u)); every neighbor
      // v > u re-hangs onto m(u). m(u) <= u < v, so (m, v) is canonical.
      val sym = e.union(e.select(col("hi").as("lo"), col("lo").as("hi")))
        .toDF("u", "v")
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("__nmin"))
        .select(col("u"), least(col("u"), col("__nmin")).as("m"))
      // NOT distinct'd: sym.where(v > u) is exactly e (one row per
      // canonical edge) joined 1:1 to mins, so large-star output has
      // |e| rows before dedup; duplicates from different u mapping to
      // the same (m, v) are collapsed by e2's distinct below either
      // way, and dropping the intermediate exchange removes one full
      // shuffle from EVERY contraction round
      val ls = sym.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("m").as("lo"), col("v").as("hi"))
        .where(col("lo") =!= col("hi"))
      // small-star on the downward orientation (hi -> lo): every
      // smaller neighbor (and u itself) re-hangs onto min N_down(u).
      // mv <= v for each down-neighbor v, so pairs stay canonical.
      val down = ls.select(col("hi").as("u"), col("lo").as("v"))
      val dmins = down.groupBy(col("u")).agg(min(col("v")).as("mv"))
      val rewired = down.join(dmins, "u")
        .select(col("mv").as("lo"), col("v").as("hi"))
        .where(col("lo") =!= col("hi"))
      val selfEdges = dmins
        .select(col("mv").as("lo"), col("u").as("hi"))
      val e2 = keep(rewired.union(selfEdges).distinct())
      val e2Count = e2.count()
      converged = e2Count == eCount &&
        e2.join(e, Seq("lo", "hi"), "left_anti").limit(1).count() == 0L
      e = e2
      eCount = e2Count
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxRounds rounds")
    // star fixpoint: (root, member) edges + the roots themselves
    e.select(col("hi").as("id"), col("lo").as("cluster"))
      .union(e.select(col("lo").as("id"), col("lo").as("cluster")))
      .distinct()
  }

  /** Canonical-representative selection — the step after clustering in
    * every dedup pipeline: per duplicate cluster keep ONE document (the
    * highest-quality member: max `qualityCol`, ties to the smallest id)
    * and mark the rest for dropping.
    *
    * `members` is (idCol, clusterCol) — e.g. [[connectedComponents]]
    * output; `docs` carries the quality column. Champion election is a
    * map-side-combined `max(struct(quality, -id))` groupBy — one row per
    * cluster, never a per-cluster window, so a pathological million-doc
    * template cluster costs its partials, not one buffering task. The
    * champion frame (|clusters| rows <= |members|) joins back on the
    * cluster key.
    */
  def canonicalPerCluster(members: DataFrame, idCol: String,
      clusterCol: String, docs: DataFrame,
      qualityCol: String): DataFrame = {
    val withQ = members.join(
      docs.select(col(idCol), col(qualityCol)), Seq(idCol))
    val champs = withQ.groupBy(col(clusterCol))
      .agg(max(struct(col(qualityCol).as("q"),
        (-col(idCol)).as("negId"))).as("__c"))
      .select(col(clusterCol),
        (-col("__c.negId")).cast("long").as("__champ"))
    withQ.join(champs, Seq(clusterCol))
      .select(col(idCol), col(clusterCol), col(qualityCol),
        (col(idCol) === col("__champ")).as("is_canonical"))
  }
}
