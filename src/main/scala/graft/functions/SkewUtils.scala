package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale aggregation.
  *
  * `saltedSumCount` implements the classic two-phase salted aggregate:
  * phase 1 groups on (key, salt) — the hot key's rows spread over
  * `salts` reducers — phase 2 merges the partials per key. For algebraic
  * aggregates (sum/count/min/max and anything built from them, e.g. avg)
  * the result is exactly the direct groupBy. AQE's skew handling covers
  * joins; this covers aggregations whose single hot key would otherwise
  * serialize one reducer.
  */
object SkewUtils {

  /** Two-phase salted sum+count per key; returns
    * (keyCols*, {v}_sum, {v}_count) exactly equal to the direct agg. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(col(valueCol)).as("__c"))
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__s")).as(s"${valueCol}_sum"),
        sum(col("__c")).as(s"${valueCol}_count"))
  }
}
