package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact grouped percentiles with a plan-time scale guard.
  *
  * Spark's exact `percentile` aggregate buffers EVERY value of a group
  * in one aggregation buffer on one reducer — with G groups over N rows
  * the largest buffer holds ~N/G doubles, so at low group cardinality
  * the operator degenerates to a near-global sort on single reducers
  * (3 groups over 10⁹ rows = ~2.7 GB of doubles in one buffer). That is
  * the same failure shape Spark itself warns about for unpartitioned
  * windows ("No Partition Defined for Window operation"), so this
  * helper emits the analogous warning at PLAN TIME whenever the group
  * count is known to be (or measured as) small, pointing at the
  * bounded-state alternatives: `approx_percentile` (t-digest sketch,
  * mergeable map-side) or the `approx` knob on
  * [[graft.operators.Winsorizer]]/[[graft.operators.RobustScaler]].
  *
  * The guard never changes the plan — exact stays exact (the DuckDB
  * oracle depends on it); it only makes the 100×-scale-up hazard
  * visible where the query is declared. */
object Percentiles {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Group-count threshold below which the exact mode is flagged. */
  val LowCardinality = 64L

  /** Last warning emitted by THIS thread's most recent `exact` call
    * (test observability; None when that call was clean). Thread-local
    * so concurrent query declarations cannot race each other's state. */
  private val lastWarn =
    ThreadLocal.withInitial[Option[String]](() => None)
  def lastWarning: Option[String] = lastWarn.get()

  /** Exact percentiles of `valueCol` per `groupCol` at `percentages`,
    * as one `percentile(..., array(...))` aggregate (the group's value
    * buffer is built once and probed per percentage). `knownGroups`
    * lets callers that already know the key cardinality (dictionary
    * columns, enums) trigger the guard without a count job; pass -1 to
    * skip the check entirely. */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      percentages: Seq[Double], knownGroups: Long = -1L): DataFrame = {
    lastWarn.set(None)
    if (knownGroups >= 0 && knownGroups < LowCardinality) {
      val msg = s"exact percentile over ~$knownGroups group(s) of " +
        s"'$groupCol' buffers every '$valueCol' value per group on one " +
        "reducer; at scale prefer approx_percentile (mergeable t-digest) " +
        "or the winsorize/robust-scale `approx` knob"
      lastWarn.set(Some(msg))
      log.warn(msg)
    }
    // graft.functions.ExactPercentilesAgg: same estimator and null
    // handling as Spark's `percentile`, primitive buffer instead of a
    // boxed hash map (~2x on the bench's low-cardinality groups)
    df.groupBy(groupCol)
      .agg(graft.functions.ExactPercentiles(
        col(valueCol).cast("double"), percentages).as("__q"))
  }
}
