package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shuffle-light form of the per-group top-k rank:
  *
  *   row_number() OVER (PARTITION BY group ORDER BY score DESC, id ASC)
  *   ... WHERE rank <= k
  *
  * re-expressed as one [[TopKBy]] partial aggregate + posexplode. The
  * window form shuffles and sorts EVERY candidate row of every group to
  * rank rows it then throws away — for the ANN search family that is the
  * whole probe×candidate frame (payload columns included) through one
  * exchange per query. As an aggregate, each map task forwards at most
  * k (score, id) pairs per group it saw, the merge is a bounded heap
  * union, and the exchange carries O(groups × k) — independent of the
  * candidate count (spark_optimization_guide §2.3 "aggregate before you
  * shuffle").
  *
  * Semantics match the window form exactly when (a) the (score, id)
  * order is total within a group — id unique, which every ANN call site
  * guarantees — and (b) scores are non-null/non-NaN (TopKBy skips NaN
  * where a window would rank it first; ANN cosines over non-zero-norm
  * vectors never produce NaN — zero-norm inputs are filtered or
  * rejected upstream at every call site). `carry` columns must be
  * functionally determined by the group key (probe-side payloads like
  * the query vector); they ride the aggregation buffer via first().
  */
object TopKRank {

  /** @param group  grouping (probe-key) column names
    * @param score  double-valued ranking column (DESC)
    * @param id     unique-per-group tiebreak column (ASC) — any integral
    *               type; round-trips through long exactly
    * @param rankCol output rank column name (1-based int, like
    *                row_number)
    * @param carry  group-constant columns to keep (first() per group)
    * @return (group ++ carry ++ id, score, rankCol) — at most k rows per
    *         group, best-first
    */
  def rankTopK(df: DataFrame, group: Seq[String], score: String,
      id: String, k: Int, rankCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val idType = df.schema(id).dataType
    val scoreType = df.schema(score).dataType
    val tk = TopKBy.topkBy(col(score).cast("double"),
      col(id).cast("long"), k).as("__tk")
    val g = df.groupBy(group.map(col): _*)
      .agg(tk, carry.map(c => first(col(c)).as(c)): _*)
    g.select((group ++ carry).map(col) :+
        posexplode(col("__tk")).as(Seq("__pos", "__kv")): _*)
      .select((group ++ carry).map(col) ++ Seq(
        col("__kv.id").cast(idType).as(id),
        col("__kv.score").cast(scoreType).as(score),
        (col("__pos") + 1).cast("int").as(rankCol)): _*)
  }
}
