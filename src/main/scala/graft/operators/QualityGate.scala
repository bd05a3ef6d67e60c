package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gating — the Deequ/dbt-test shape: declarative
  * constraints over a table (row-count floors, null-fraction ceilings,
  * value ranges, cardinality caps) evaluated in ONE aggregation pass
  * and emitted as data (check, observed, bounds, pass), so a pipeline
  * can circuit-break on `pass = false` rows before writing garbage
  * downstream.
  *
  * Scale shape: every metric is a parallel aggregate expression in a
  * single `agg` — map-side partials, one scalar row on the driver-side
  * of the exchange, then a constant-size unpivot projection (one row
  * per check). Adding checks adds expressions, never passes. Exact
  * `countDistinct` metrics plan through Expand like
  * [[TableProfile]] — `approx_count_distinct` is the documented
  * 100 TB swap there too.
  *
  * No reference counterpart (centimators assumes clean inputs);
  * greenfield SURVEY.md §7.6 scope — the enforcement companion of
  * [[TableProfile]]'s observability.
  */
object QualityGate {

  /** One constraint: `metric` must land in [lo, hi] (either bound
    * optional). The metric must be an aggregate expression. */
  final case class Check(name: String, metric: Column,
      lo: Option[Double] = None, hi: Option[Double] = None)

  def minRows(n: Long): Check =
    Check("min_rows", count(lit(1)).cast("double"), lo = Some(n.toDouble))

  def maxNullFrac(c: String, frac: Double): Check =
    Check(s"null_frac_$c",
      (count(lit(1)) - count(col(c))).cast("double") / count(lit(1)),
      hi = Some(frac))

  def valueRange(c: String, lo: Double, hi: Double): Seq[Check] = Seq(
    Check(s"min_$c", min(col(c)).cast("double"), lo = Some(lo)),
    Check(s"max_$c", max(col(c)).cast("double"), hi = Some(hi)))

  def maxDistinct(c: String, n: Long): Check =
    Check(s"distinct_$c", countDistinct(col(c)).cast("double"),
      hi = Some(n.toDouble))

  /** (check, observed, lo, hi, pass) — one row per check, one pass
    * over `df`. A null observed value (e.g. min of an all-null column)
    * fails any bounded check. */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "quality gate needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric.as(s"__m$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i")
      val okLo = c.lo.map(v => m >= lit(v)).getOrElse(lit(true))
      val okHi = c.hi.map(v => m <= lit(v)).getOrElse(lit(true))
      struct(lit(c.name).as("check"), m.as("observed"),
        c.lo.map(lit(_)).getOrElse(lit(null).cast("double")).as("lo"),
        c.hi.map(lit(_)).getOrElse(lit(null).cast("double")).as("hi"),
        (m.isNotNull && okLo && okHi).as("pass"))
    }
    row.select(explode(array(out: _*)).as("__c")).select(col("__c.*"))
  }
}
