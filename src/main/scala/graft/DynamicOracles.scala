package graft

import java.util.concurrent.atomic.AtomicReference

/** Fitted-model registry backing the DYNAMIC oracles.
  *
  * Some fits are deterministic pure functions of the data (md5-ordered
  * bounded samples, seeded init, fixed driver loops) but have no direct
  * SQL form — seeded k-means, the Jacobi eigensolve. Their SEARCH /
  * PROJECT paths, however, are fully SQL-expressible once the fitted
  * parameters exist. So the query stores its fitted parameters here at
  * run time, and the oracle-SQL generator (evaluated by [[Verify]] AFTER
  * all queries ran) embeds them as literals in an oracle that
  * INDEPENDENTLY VERIFIES them against DuckDB's own aggregates (eigen
  * residuals against a freshly computed covariance, etc.) before using
  * them — a wrong fit makes the oracle emit NULLs and the hash compare
  * fails. `Double.toString` literals round-trip exactly (shortest
  * representation that parses back to the same IEEE double), so the
  * projection arithmetic stays bit-identical across engines.
  *
  * Entries are absent until the corresponding query runs; the oracle
  * maps simply omit those queries then (rows-only fallback — the
  * pre-round-9 behavior).
  */
object DynamicOracles {

  /** q_pca: (means, loadings[component][feature]) from DimReducer.fit. */
  val pca = new AtomicReference[(Array[Double], Array[Array[Double]])]()

  /** q_ivf_topk: the trained coarse-quantizer centroids. */
  val ivfCentroids = new AtomicReference[Array[Array[Double]]]()

  /** q_pq_trained: the trained per-subspace PQ codebooks. */
  val pqCodebooks = new AtomicReference[Array[Array[Array[Double]]]]()
}
