package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Join / top-k / correlation queries (SURVEY.md §2.5, §2.8).
  *
  * Join strategy at scale: dimension tables (customer, supplier, nation,
  * region, part) broadcast — lineitem/orders never shuffle for these
  * plans; the aggregate does one partial-agg exchange on the (tiny) group
  * key space.
  */
object QueriesRelational {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // customer ⋈ orders ⋈ lineitem → revenue by market segment
    "q_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // supplier ⋈ nation ⋈ region star join, broadcast dims
    "q_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // top-3 parts per brand by retail price (deterministic tiebreak)
    "q_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          col("rk"))
    }),

    // Bucketed-layout co-located join: pay the fact tables' shuffle at
    // WRITE time (bucketBy the join key), then join and aggregate on the
    // same key with ZERO exchanges in the plan — the daily-rescan shape a
    // 100 TB pipeline wants, where the join key is stable and the data is
    // read many more times than it is written. PlanSpec pins the
    // no-Exchange sort-merge plan; the oracle only checks values (the
    // layout is semantics-preserving by construction).
    "q_bucketed_join" -> ((s, dir) => {
      import graft.sources.BucketedLayout
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      BucketedLayout.writeBucketed(li, "l_orderkey", 8,
        "graft_li_bkt", BucketedLayout.scratchDir("li_bkt"))
      BucketedLayout.writeBucketed(ord, "o_orderkey", 8,
        "graft_ord_bkt", BucketedLayout.scratchDir("ord_bkt"))
      val lb = s.table("graft_li_bkt")
      val ob = s.table("graft_ord_bkt")
      // revenue in EXACT integer 1e-4 units (price cents × discount
      // basis-point complement — both 2dp-valued): with 14k+ output
      // groups a double sum's engine-specific accumulation order (and a
      // terminal decimal round after division) flips a cent somewhere;
      // integer sums are order-free and need no rounding at all (the
      // q_rolling_corr convention)
      val cents = round(col("l_extendedprice") * 100, 0).cast("long")
      val bp = lit(100L) - round(col("l_discount") * 100, 0).cast("long")
      lb.hint("merge").join(ob, lb("l_orderkey") === ob("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(sum(cents * bp).as("revenue_e4"),
          count(lit(1)).as("n_lines"))
    }),

    // Hive-style partitioned write + partition-PRUNED read: the filter
    // column becomes a directory level, so the predicate prunes whole
    // directories at planning time (PartitionFilters — non-matching files
    // are never listed into the scan; PlanSpec pins it). The write-side
    // companion of the §2.2 PushedFilters pin.
    "q_partitioned_prune" -> ((s, dir) => {
      import graft.sources.BucketedLayout
      val path = BucketedLayout.scratchDir("li_part")
      BucketedLayout.writePartitioned(
        t(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice"),
        "l_returnflag", path)
      s.read.parquet(path)
        .where(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n_lines"))
    }),

    // Spearman correlation per group: average-tie ranks of both sides,
    // then Pearson corr — the exact (non-soft) form of the reference's
    // SpearmanCorrelation loss (losses.py:22-122, SURVEY.md §2.8).
    "q_spearman" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = Seq(col("l_returnflag"))
      val ranked = li.select(col("l_returnflag"),
        avgRank(col("l_quantity"), part).as("ra"),
        avgRank(col("l_extendedprice"), part).as("rb"))
      ranked.groupBy(col("l_returnflag"))
        .agg(round(corr(col("ra"), col("rb")), 6).as("spearman"),
          count(lit(1)).as("n"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_join_agg" ->
      """SELECT c_mktsegment,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_star_join" ->
      """SELECT r_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_topk" ->
      """SELECT p_brand, p_partkey, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |   AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority""".stripMargin,
    "q_partitioned_prune" ->
      """SELECT l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | count(*) AS n_lines
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus""".stripMargin,
    "q_spearman" ->
      """WITH ranked AS (
        |  SELECT l_returnflag,
        |    (rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC)
        |     + (count(l_quantity) OVER (PARTITION BY l_returnflag
        |         ORDER BY l_quantity ASC
        |         RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1) / 2.0) AS ra,
        |    (rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice ASC)
        |     + (count(l_extendedprice) OVER (PARTITION BY l_returnflag
        |         ORDER BY l_extendedprice ASC
        |         RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1) / 2.0) AS rb
        |  FROM lineitem)
        |SELECT l_returnflag, round(corr(ra, rb), 6) AS spearman,
        |  count(*) AS n
        |FROM ranked GROUP BY l_returnflag""".stripMargin
  )
}
