package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2, plus the large-scale pipeline extensions);
  * `oracleSql` holds the DuckDB twin of every SQL-expressible query.
  */
object SparkEntry {

  /** Flagship: the reference's README pipeline shape (logreturn → rank →
    * lag → ma chained in one lazy plan; reference README.md:144-148)
    * applied to the sf0.001 lineitem panel. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = Seq("l_shipdate", "l_orderkey", "l_linenumber")
    val pipeline = Pipeline(Seq(
      LogReturnTransformer(Seq("l_extendedprice"), "l_suppkey", ord),
      RankTransformer(Seq("l_extendedprice_logreturn"), "l_shipdate"),
      LagTransformer(Seq("l_extendedprice_logreturn_rank"), Seq(1, 2),
        "l_suppkey", ord),
      MovingAverageTransformer(Seq("l_extendedprice_logreturn_rank"), Seq(4),
        "l_suppkey", ord)
    ))
    pipeline.transform(li)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesSolvers.queries ++
      QueriesRelational.queries ++ QueriesText.queries ++
      QueriesSim.queries ++ QueriesStream.queries ++ QueriesML.queries ++
      QueriesCorpus.queries

  def oracleSql: Map[String, String] =
    QueriesCore.oracleSql ++ QueriesSolvers.oracleSql ++
      QueriesRelational.oracleSql ++ QueriesText.oracleSql ++
      QueriesSim.oracleSql ++ QueriesStream.oracleSql ++
      QueriesML.oracleSql ++ QueriesCorpus.oracleSql
}
