package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Purged k-fold cross-validation splits for time-ordered panels —
  * the leakage-safe CV scheme of López de Prado ("Advances in
  * Financial Machine Learning", 2018, ch. 7, public literature; the
  * evaluation protocol the reference's era-wise financial panels call
  * for): eras are split into k CONTIGUOUS test blocks, and for each
  * fold the eras within `embargo` of the test block are PURGED from
  * the training set, so overlapping-label leakage across the
  * train/test boundary is structurally impossible.
  *
  * The computation lives entirely on the ERA SPINE — the distinct
  * sorted eras, a frame bounded by the calendar (like
  * [[Resample]]'s date grid), never the fact table: one tiny distinct
  * + row_number, a k-row block-extent aggregate, and a spine × fold
  * cross join of E·k rows. Role assignment is then a broadcast join
  * onto the fact rows (the caller's step, or [[assignRows]]). Fold of
  * era i is floor(i·k/E) — contiguous, near-equal blocks, no
  * sampling, so the whole assignment is engine-exact and carries a
  * full oracle.
  *
  * No reference counterpart in code (model_estimators assume the
  * split is given); greenfield SURVEY.md §7.6 scope.
  */
object PurgedKFold {

  /** (era, fold, role) for every era × fold; role ∈ train | test |
    * purged. */
  def eraRoles(df: DataFrame, eraCol: String, k: Int,
      embargo: Int): DataFrame = {
    require(k >= 2 && embargo >= 0, s"purged k-fold: k=$k embargo=$embargo")
    // era spine: tiny by contract (calendar-bounded), the one
    // single-partition window in this operator runs over it, not rows
    val eras = df.select(col(eraCol).as("era")).distinct()
      .withColumn("__i",
        row_number().over(Window.orderBy(col("era"))) - 1)
    val e = eras.count()
    val fold = floor(col("__i") * k / lit(e)).cast("int")
    val indexed = eras.withColumn("__f", fold)
    val extents = indexed.groupBy(col("__f").as("fold"))
      .agg(min("__i").as("__lo"), max("__i").as("__hi"))
    indexed.crossJoin(broadcast(extents))
      .select(col("era"), col("fold"),
        when(col("__f") === col("fold"), "test")
          .when(col("__i") >= col("__lo") - embargo &&
            col("__i") <= col("__hi") + embargo, "purged")
          .otherwise("train").as("role"))
  }

  /** Fact rows exploded per fold with their era's role attached —
    * `roles` broadcasts (E·k rows). The roles frame's era key is
    * renamed to a reserved name before the join so a caller whose
    * `eraCol` is itself named "era" gets an unambiguous condition and
    * keeps their own column. */
  def assignRows(df: DataFrame, eraCol: String, k: Int,
      embargo: Int): DataFrame = {
    val roles = eraRoles(df, eraCol, k, embargo)
      .withColumnRenamed("era", "__pk_era")
    df.join(broadcast(roles), df(eraCol) === col("__pk_era"))
      .drop("__pk_era")
  }
}
