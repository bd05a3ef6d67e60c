package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKBy.topkBy

/** Per-domain document cap (RefinedWeb §3.1 / C4-style: a handful of
  * template-heavy domains dominate any web crawl, so bound each
  * domain's contribution, keeping its BEST documents).
  *
  * `cap(docs, "source", n_chars, doc_id, 50)` keeps the top 50 docs per
  * source by (score DESC, id ASC) and emits (group, id, score, rk).
  *
  * The plan is ONE partial top-k aggregation ([[graft.functions.TopKBy]])
  * followed by a posexplode of the ≤k-element result arrays: each task
  * forwards at most k rows per group it touched, the exchange carries
  * O(domains × k) regardless of corpus size, and no full per-domain
  * sort ever happens — unlike the row_number window mirror the oracle
  * uses, which shuffles and sorts the whole corpus. The hottest domain
  * in the crawl costs the same as the coldest.
  *
  * No reference analog (centimators has no corpus layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object DomainCap {

  /** One row per kept doc: (groupCol, id, score, rk) with rk 1-based in
    * (score DESC, id ASC) order within the group. */
  def cap(docs: DataFrame, groupCol: String, score: Column, id: Column,
      k: Int): DataFrame = {
    docs
      .groupBy(col(groupCol))
      .agg(topkBy(score.cast("double"), id.cast("long"), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(groupCol), col("__e.id").as("id"),
        col("__e.score").as("score"),
        (col("__pos") + lit(1)).cast("int").as("rk"))
  }
}
