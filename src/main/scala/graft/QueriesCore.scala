package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Core operator queries (SURVEY.md §2.3-§2.5) over the driver testdata.
  *
  * Each query has a DuckDB-oracle twin in [[oracleSql]]; column names and
  * rounding are aligned on both sides (the driver hash-compares values
  * after sorting columns by name).
  *
  * `lineitem` plays the reference's panel: l_shipdate ↔ date_series,
  * l_suppkey ↔ ticker_series, price/qty/discount/tax ↔ features
  * (FIXTURES.md §2). Deterministic ordering inside window specs uses the
  * unique key (l_orderkey, l_linenumber).
  */
object QueriesCore {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  private val keys = Seq("l_orderkey", "l_linenumber")
  private val ord = Seq("l_shipdate", "l_orderkey", "l_linenumber")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RankTransformer: per-shipdate normalized average-tie rank.
    "q_rank" -> ((s, dir) => {
      RankTransformer(Seq("l_extendedprice", "l_quantity"), "l_shipdate")
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_rank"), 6).as("price_rank"),
          round(col("l_quantity_rank"), 6).as("qty_rank"))
    }),

    // LagTransformer: windows [2,1] (descending contract), per supplier.
    "q_lag" -> ((s, dir) => {
      LagTransformer(Seq("l_extendedprice"), Seq(1, 2), "l_suppkey", ord)
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice_lag1").as("price_lag1"),
          col("l_extendedprice_lag2").as("price_lag2"))
    }),

    // MovingAverageTransformer: trailing mean w=2,4 with min_samples=w.
    "q_ma" -> ((s, dir) => {
      MovingAverageTransformer(Seq("l_extendedprice"), Seq(2, 4), "l_suppkey", ord)
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_ma2"), 6).as("price_ma2"),
          round(col("l_extendedprice_ma4"), 6).as("price_ma4"))
    }),

    // trailing rolling std/min/max with the min-samples contract
    "q_rolling" -> ((s, dir) => {
      RollingStatsTransformer(Seq("l_extendedprice"), Seq(4), "l_suppkey",
        ord).transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_std4"), 6).as("price_std4"),
          round(col("l_extendedprice_min4"), 6).as("price_min4"),
          round(col("l_extendedprice_max4"), 6).as("price_max4"))
    }),

    // Rolling pairwise stats between two series per supplier: corr,
    // beta (cov/var(y)), cov over a 10-row trailing frame — the quant
    // companions of the rolling family, same single-exchange window.
    "q_rolling_corr" -> ((s, dir) => {
      // integer-valued inputs (price in cents, integral quantity) make
      // the sum-formula window stats EXACT under any evaluation order
      // — bit-identical across engines (see RollingCorrTransformer)
      val base = li(s, dir)
        .withColumn("price_c", graft.functions.FastRound(
          col("l_extendedprice") * 100, 0).cast("long"))
        .withColumn("qty_i", col("l_quantity").cast("long"))
      RollingCorrTransformer("price_c", "qty_i", Seq(10),
        "l_suppkey", ord).transform(base)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("price_c_qty_i_corr10"), 6).as("corr10"),
          round(col("price_c_qty_i_beta10"), 6).as("beta10"),
          round(col("price_c_qty_i_cov10"), 4).as("cov10"))
    }),

    // Truncated EWMA per supplier (pandas ewm.mean shape): pure lag
    // projection after one ticker sort, bit-identical weight chain in
    // both engines.
    "q_ewma" -> ((s, dir) => {
      EwmaTransformer(Seq("l_extendedprice"), span = ewmaSpan,
        lookback = ewmaLookback, "l_suppkey", ord).transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_ewma"), 6).as("price_ewma"))
    }),

    // Calendar resample + forward fill: one row per (returnflag, day),
    // daily mean price carried over gap days, gaps flagged — the panel
    // completion step ahead of any windowed feature.
    "q_resample" -> ((s, dir) => {
      graft.operators.Resample.dailyFfill(li(s, dir), "l_returnflag",
        "l_shipdate", "l_extendedprice")
        .select(col("l_returnflag"),
          // ISO string: parquet DATE arrives as datetime.date from
          // Spark but datetime64 from DuckDB in the compare harness
          col("day").cast("string").as("day"),
          round(col("l_extendedprice_ffill"), 6).as("price_ffill"),
          col("is_gap"))
    }),

    // LogReturnTransformer: ln diff per supplier over shipdate order.
    "q_logreturn" -> ((s, dir) => {
      LogReturnTransformer(Seq("l_extendedprice"), "l_suppkey", ord)
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_logreturn"), 6).as("price_logreturn"))
    }),

    // GroupStatsTransformer: horizontal stats across 4 feature columns.
    "q_groupstats" -> ((s, dir) => {
      GroupStatsTransformer(
        Map("g1" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("g1_groupstats_mean"), 6).as("g1_mean"),
          round(col("g1_groupstats_std"), 6).as("g1_std"),
          round(col("g1_groupstats_skew"), 6).as("g1_skew"),
          round(col("g1_groupstats_kurt"), 6).as("g1_kurt"),
          round(col("g1_groupstats_range"), 6).as("g1_range"),
          round(col("g1_groupstats_cv"), 6).as("g1_cv"))
    }),

    // Vertical aggregation (TPC-H Q1 shape): partial-agg friendly.
    "q_agg" -> ((s, dir) => {
      li(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Predicate + projection pushdown to the parquet scan.
    "q_filter" -> ((s, dir) => {
      li(s, dir)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    }),

    // Exact distinct counting per group (one partial-agg shuffle).
    "q_distinct" -> ((s, dir) => {
      li(s, dir).groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
    }),

    // exact grouped quantiles (linear interpolation — the sort-based
    // exact operator; the KMV sketch below is the approximate scale
    // path). ONE percentile aggregate with all three percentages: the
    // group's value buffer is built once and probed three times.
    // l_returnflag has 3 values, so the Percentiles guard logs the
    // plan-time low-cardinality warning pointing at the approx knob.
    "q_quantiles" -> ((s, dir) => {
      graft.operators.Percentiles.exact(li(s, dir), "l_returnflag",
        "l_extendedprice", Seq(0.5, 0.9, 0.99), knownGroups = 3L)
        .select(col("l_returnflag"),
          round(element_at(col("__q"), 1), 4).as("p50"),
          round(element_at(col("__q"), 2), 4).as("p90"),
          round(element_at(col("__q"), 3), 4).as("p99"))
    }),

    // KMV distinct-count sketch: deterministic md5 arithmetic, so the
    // APPROXIMATE estimate still hash-matches the oracle bit-for-bit
    "q_kmv_distinct" -> ((s, dir) => {
      graft.functions.Sketches.kmvDistinct(li(s, dir),
        Seq("l_returnflag"), "l_partkey", k = 256)
        .select(col("l_returnflag"),
          round(col("approx_distinct"), 4).as("approx_distinct"))
    }),

    // Two-phase salted aggregation — byte-identical to the direct
    // groupBy (the oracle IS the direct groupBy), spreads a hot key
    // across `salts` reducers at scale.
    "q_salted" -> ((s, dir) => {
      graft.functions.SkewUtils
        .saltedSumCount(li(s, dir), Seq("l_returnflag"), "l_quantity")
        .select(col("l_returnflag"),
          round(col("l_quantity_sum"), 2).as("sum_qty"),
          col("l_quantity_count").as("n"))
    }),

    // One-pass table profile: per-column ingest statistics as data
    // (exact distincts for the oracle; approx_count_distinct at 100 TB).
    "q_profile" -> ((s, dir) => {
      TableProfile.profile(li(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),

    // Purged walk-forward k-fold CV splits (Lopez de Prado ch. 7):
    // contiguous era test blocks, embargoed neighbors purged from
    // train — computed entirely on the tiny era spine.
    "q_purged_cv" -> ((s, dir) => {
      val eras = li(s, dir).select(
        date_format(col("l_shipdate"), "yyyy-MM").as("era_m"))
      graft.operators.PurgedKFold.eraRoles(eras, "era_m",
        k = 5, embargo = 2)
        .select(col("era"), col("fold"), col("role"))
    }),

    // Deequ-style data-quality gate: declarative constraints evaluated
    // in ONE aggregation pass, emitted as (check, observed, bounds,
    // pass) rows — the circuit-breaker ahead of any downstream write.
    "q_quality_gate" -> ((s, dir) => {
      import graft.operators.QualityGate._
      evaluate(li(s, dir),
        Seq(minRows(1000), maxNullFrac("l_returnflag", 0.01)) ++
          valueRange("l_quantity", 1.0, 50.0) ++
          valueRange("l_discount", 0.0, 0.1) :+
          maxDistinct("l_returnflag", 3))
        .select(col("check"), round(col("observed"), 6).as("observed"),
          col("lo"), col("hi"), col("pass"))
    }),

    // Z-order layout keys (the OPTIMIZE ZORDER BY shape): 8-bit
    // quantization of two clustering columns, Morton interleave, and
    // the 16-way layout bucket (z >> 12) the range exchange targets —
    // the key arithmetic under a full oracle; the exchange itself is
    // pinned in PlanSpec/the locality test.
    "q_zorder" -> ((s, dir) => {
      graft.operators.ZOrder.withZ(li(s, dir),
        Seq("l_extendedprice", "l_quantity"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("z"),
          shiftrightunsigned(col("z"), 12).as("bucket"))
    }),

    // Global min-max scaling via broadcast scalar aggregate (no global window).
    "q_minmax" -> ((s, dir) => {
      MinMaxScaler(Seq("l_extendedprice")).transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_scaled"), 6).as("price_scaled"))
    }),

    // leave-one-out target encoding of a categorical key
    "q_target_encode" -> ((s, dir) => {
      TargetEncoder(Seq("l_returnflag"), "l_extendedprice")
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_returnflag_te"), 6).as("flag_te"))
    }),

    // median/MAD robust scaling per group
    "q_robust_scale" -> ((s, dir) => {
      RobustScaler(Seq("l_extendedprice"), "l_returnflag")
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_robust"), 6).as("price_robust"))
    }),

    // per-group quantile clipping (exact interpolated percentile)
    "q_winsorize" -> ((s, dir) => {
      Winsorizer(Seq("l_extendedprice"), "l_returnflag").transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_wins"), 6).as("price_wins"))
    }),

    // equal-frequency discretization: price quartile per return flag —
    // one cuts aggregate broadcast back, bin index a scan-speed fold
    "q_qbin" -> ((s, dir) => {
      QuantileBinner("l_extendedprice", k = 4, Seq("l_returnflag"))
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("bin"))
    })
  )

  private val rankSql = (v: String) =>
    s"""(rank() OVER (PARTITION BY l_shipdate ORDER BY $v ASC)
       | + (count($v) OVER (PARTITION BY l_shipdate ORDER BY $v ASC
       |     RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1) / 2.0)
       | / count($v) OVER (PARTITION BY l_shipdate)""".stripMargin

  private val tickerOrd =
    "PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber"

  // EWMA parameters shared by the Spark query and its oracle mirror
  private val ewmaSpan = 5.0
  private val ewmaLookback = 10

  private def maSql(v: String, w: Int) =
    s"""CASE WHEN count($v) OVER ($tickerOrd
       |  ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) = $w
       | THEN avg($v) OVER ($tickerOrd
       |  ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) END""".stripMargin

  // Horizontal stats SQL mirrors graft.functions (null-free columns here, so
  // the null-skipping terms reduce to plain arithmetic).
  private val gsCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val gsN = gsCols.size
  private val gsMean = s"(${gsCols.mkString(" + ")}) / $gsN.0"
  private def gsSS(p: Int) =
    gsCols.map(c => s"pow(($c - m) / s, $p.0)").mkString(" + ")
  private val gsVar =
    s"(${gsCols.map(c => s"pow($c - m, 2.0)").mkString(" + ")}) / ${gsN - 1}.0"
  private val skewC = s"($gsN.0 / (${gsN - 1}.0 * ${gsN - 2}.0))"
  private val kurtC1 =
    s"(($gsN.0 * ${gsN + 1}.0) / (${gsN - 1}.0 * ${gsN - 2}.0 * ${gsN - 3}.0))"
  private val kurtC2 =
    s"((3.0 * ${gsN - 1}.0 * ${gsN - 1}.0) / (${gsN - 2}.0 * ${gsN - 3}.0))"

  val oracleSql: Map[String, String] = Map(
    "q_target_encode" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN n > 1 THEN (s - l_extendedprice) / (n - 1)
        |    ELSE gm END, 6) AS flag_te
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    sum(l_extendedprice) OVER (PARTITION BY l_returnflag) AS s,
        |    count(l_extendedprice) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |  (SELECT avg(l_extendedprice) AS gm FROM lineitem)""".stripMargin,

    "q_robust_scale" ->
      """WITH med AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.5) AS m
        |  FROM lineitem GROUP BY l_returnflag),
        |mad AS (SELECT l.l_returnflag,
        |    quantile_cont(abs(l.l_extendedprice - med.m), 0.5) AS d
        |  FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
        |  GROUP BY l.l_returnflag)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  round(CASE WHEN mad.d > 1e-12
        |    THEN (l.l_extendedprice - med.m) / (1.4826 * mad.d) END, 6)
        |    AS price_robust
        |FROM lineitem l
        |JOIN med ON l.l_returnflag = med.l_returnflag
        |JOIN mad ON l.l_returnflag = mad.l_returnflag""".stripMargin,

    "q_winsorize" ->
      """WITH q AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber,
        |  round(least(greatest(l_extendedprice, lo), hi), 6) AS price_wins
        |FROM lineitem JOIN q USING (l_returnflag)""".stripMargin,

    "q_rank" ->
      s"""SELECT l_orderkey, l_linenumber,
         | round(${rankSql("l_extendedprice")}, 6) AS price_rank,
         | round(${rankSql("l_quantity")}, 6) AS qty_rank
         |FROM lineitem""".stripMargin,
    "q_lag" ->
      s"""SELECT l_orderkey, l_linenumber,
         | lag(l_extendedprice, 1) OVER ($tickerOrd) AS price_lag1,
         | lag(l_extendedprice, 2) OVER ($tickerOrd) AS price_lag2
         |FROM lineitem""".stripMargin,
    "q_ma" ->
      s"""SELECT l_orderkey, l_linenumber,
         | round(${maSql("l_extendedprice", 2)}, 6) AS price_ma2,
         | round(${maSql("l_extendedprice", 4)}, 6) AS price_ma4
         |FROM lineitem""".stripMargin,
    "q_logreturn" ->
      s"""SELECT l_orderkey, l_linenumber,
         | round(ln(l_extendedprice) - lag(ln(l_extendedprice), 1)
         |   OVER ($tickerOrd), 6) AS price_logreturn
         |FROM lineitem""".stripMargin,
    "q_rolling" -> {
      def roll(fn: String, w: Int) =
        s"""CASE WHEN count(l_extendedprice) OVER ($tickerOrd
           |  ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) = $w
           | THEN $fn(l_extendedprice) OVER ($tickerOrd
           |  ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) END""".stripMargin
      s"""SELECT l_orderkey, l_linenumber,
         | round(${roll("stddev_samp", 4)}, 6) AS price_std4,
         | round(${roll("min", 4)}, 6) AS price_min4,
         | round(${roll("max", 4)}, 6) AS price_max4
         |FROM lineitem""".stripMargin
    },
    "q_rolling_corr" ->
      // sum-formula mirror over exact integer window sums (cents ×
      // units): 10Σxy − ΣxΣy and the variance factors are exact under
      // any order, so corr/beta/cov are bit-identical to the Spark side
      s"""WITH b AS (SELECT l_orderkey, l_linenumber, l_suppkey,
         |  l_shipdate,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
         |  CAST(l_quantity AS BIGINT) AS yq FROM lineitem),
         |s AS (SELECT l_orderkey, l_linenumber,
         |   count(xc) OVER w AS cnt,
         |   sum(xc) OVER w AS sx, sum(yq) OVER w AS sy,
         |   sum(xc * yq) OVER w AS sxy,
         |   sum(xc * xc) OVER w AS sxx,
         |   sum(yq * yq) OVER w AS syy
         | FROM b WINDOW w AS ($tickerOrd
         |   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         |SELECT l_orderkey, l_linenumber,
         | round(CASE WHEN cnt = 10
         |   AND 10 * sxx - sx * sx > 0 AND 10 * syy - sy * sy > 0
         |  THEN CAST(10 * sxy - sx * sy AS DOUBLE)
         |    / sqrt(CAST(10 * sxx - sx * sx AS DOUBLE)
         |      * CAST(10 * syy - sy * sy AS DOUBLE)) END, 6) AS corr10,
         | round(CASE WHEN cnt = 10 AND 10 * syy - sy * sy > 0
         |  THEN CAST(10 * sxy - sx * sy AS DOUBLE)
         |    / CAST(10 * syy - sy * sy AS DOUBLE) END, 6) AS beta10,
         | round(CASE WHEN cnt = 10
         |  THEN CAST(10 * sxy - sx * sy AS DOUBLE) / 90.0 END, 4) AS cov10
         |FROM s""".stripMargin,
    "q_ewma" -> {
      // identical α^j double literals (Scala's shortest round-trip repr
      // parses back to the same double) and the identical left-assoc
      // term order as EwmaTransformer
      val alpha = 1.0 - 2.0 / (ewmaSpan + 1.0)
      def x(j: Int) =
        if (j == 0) "l_extendedprice"
        else s"lag(l_extendedprice, $j) OVER ($tickerOrd)"
      val num = (0 until ewmaLookback).map(j =>
        s"CASE WHEN ${x(j)} IS NOT NULL THEN ${x(j)} * ${math.pow(alpha, j)} ELSE 0.0 END")
        .mkString(" + ")
      val den = (0 until ewmaLookback).map(j =>
        s"CASE WHEN ${x(j)} IS NOT NULL THEN ${math.pow(alpha, j)} ELSE 0.0 END")
        .mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber,
         | round(($num) / ($den), 6) AS price_ewma
         |FROM lineitem""".stripMargin
    },

    "q_resample" ->
      """WITH per AS (
        |  SELECT l_returnflag AS k, CAST(l_shipdate AS DATE) AS day,
        |    avg(l_extendedprice) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |spans AS (SELECT k, min(day) AS d0, max(day) AS d1 FROM per
        |  GROUP BY k),
        |grid AS (SELECT k, CAST(unnest(generate_series(
        |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM spans),
        |j AS (SELECT g.k, g.day, p.v FROM grid g
        |  LEFT JOIN per p ON p.k = g.k AND p.day = g.day)
        |SELECT k AS l_returnflag, CAST(day AS VARCHAR) AS day,
        | round(last_value(v IGNORE NULLS) OVER (PARTITION BY k
        |   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |   6) AS price_ffill,
        | (v IS NULL) AS is_gap
        |FROM j""".stripMargin,
    "q_groupstats" ->
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         |         l_discount, l_tax, $gsMean AS m
         |  FROM lineitem
         |), withvar AS (
         |  SELECT *, sqrt($gsVar) AS s FROM base
         |)
         |SELECT l_orderkey, l_linenumber,
         | round(m, 6) AS g1_mean,
         | round(s, 6) AS g1_std,
         | round((${gsSS(3)}) * $skewC, 6) AS g1_skew,
         | round((${gsSS(4)}) * $kurtC1 - $kurtC2, 6) AS g1_kurt,
         | round(greatest(${gsCols.mkString(", ")})
         |   - least(${gsCols.mkString(", ")}), 6) AS g1_range,
         | round(s / m, 6) AS g1_cv
         |FROM withvar""".stripMargin,
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 45.0""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_kmv_distinct" -> {
      val h = graft.functions.Sketches.unitHashSql("l_partkey")
      s"""WITH hd AS (
         |  SELECT DISTINCT l_returnflag, $h AS hv FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, hv, row_number() OVER (
         |    PARTITION BY l_returnflag ORDER BY hv) AS rk
         |  FROM hd),
         |a AS (
         |  SELECT l_returnflag, count(*) AS n, max(hv) AS kth
         |  FROM r WHERE rk <= 256 GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
         |    ELSE 255.0 / kth END, 4) AS approx_distinct
         |FROM a""".stripMargin
    },

    "q_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_purged_cv" ->
      """WITH eras AS (SELECT DISTINCT strftime(l_shipdate, '%Y-%m')
        |  AS era FROM lineitem),
        |idx AS (SELECT era, row_number() OVER (ORDER BY era) - 1 AS i
        |  FROM eras),
        |n AS (SELECT count(*) AS e FROM idx),
        |f AS (SELECT era, i, CAST(floor(i * 5 / e) AS INT) AS fo
        |  FROM idx, n),
        |ext AS (SELECT fo AS fold, min(i) AS lo, max(i) AS hi FROM f
        |  GROUP BY fo)
        |SELECT f.era, ext.fold,
        | CASE WHEN f.fo = ext.fold THEN 'test'
        |  WHEN f.i >= ext.lo - 2 AND f.i <= ext.hi + 2 THEN 'purged'
        |  ELSE 'train' END AS role
        |FROM f CROSS JOIN ext""".stripMargin,

    "q_quality_gate" -> {
      def d(v: String) = s"CAST($v AS DOUBLE)"
      val rows = Seq(
        ("min_rows", "m0", d("1000.0"), d("NULL")),
        ("null_frac_l_returnflag", "m1", d("NULL"), d("0.01")),
        ("min_l_quantity", "m2", d("1.0"), d("NULL")),
        ("max_l_quantity", "m3", d("NULL"), d("50.0")),
        ("min_l_discount", "m4", d("0.0"), d("NULL")),
        ("max_l_discount", "m5", d("NULL"), d("0.1")),
        ("distinct_l_returnflag", "m6", d("NULL"), d("3.0"))
      ).map { case (n, m, lo, hi) => s"('$n', $m, $lo, $hi)" }
        .mkString(",\n  ")
      s"""WITH m AS (SELECT
         |  CAST(count(*) AS DOUBLE) AS m0,
         |  CAST(count(*) - count(l_returnflag) AS DOUBLE) / count(*) AS m1,
         |  CAST(min(l_quantity) AS DOUBLE) AS m2,
         |  CAST(max(l_quantity) AS DOUBLE) AS m3,
         |  CAST(min(l_discount) AS DOUBLE) AS m4,
         |  CAST(max(l_discount) AS DOUBLE) AS m5,
         |  CAST(count(DISTINCT l_returnflag) AS DOUBLE) AS m6
         | FROM lineitem)
         |SELECT c.chk AS "check", round(c.observed, 6) AS observed,
         | c.lo, c.hi,
         | (c.observed IS NOT NULL
         |   AND (c.lo IS NULL OR c.observed >= c.lo)
         |   AND (c.hi IS NULL OR c.observed <= c.hi)) AS pass
         |FROM m, LATERAL (VALUES
         |  $rows)
         |  AS c(chk, observed, lo, hi)""".stripMargin
    },

    "q_zorder" -> {
      // 8-bit linear quantization + Morton interleave, same operation
      // order as ZOrder.quantize/interleave; disjoint bit positions
      // make the interleave sum ≡ bitwise OR
      val inter = (for { b <- 0 until 8; d <- 0 until 2 }
        yield s"(((q$d >> $b) & 1) << ${b * 2 + d})").mkString(" + ")
      s"""WITH s AS (SELECT
         |  CAST(min(l_extendedprice) AS DOUBLE) AS mn0,
         |  CAST(max(l_extendedprice) AS DOUBLE) AS mx0,
         |  CAST(min(l_quantity) AS DOUBLE) AS mn1,
         |  CAST(max(l_quantity) AS DOUBLE) AS mx1 FROM lineitem),
         |q AS (SELECT l_orderkey, l_linenumber,
         |  CAST(least(255.0, greatest(0.0, CASE WHEN mx0 > mn0 THEN
         |    floor((CAST(l_extendedprice AS DOUBLE) - mn0) / (mx0 - mn0)
         |      * 255) ELSE 0.0 END)) AS BIGINT) AS q0,
         |  CAST(least(255.0, greatest(0.0, CASE WHEN mx1 > mn1 THEN
         |    floor((CAST(l_quantity AS DOUBLE) - mn1) / (mx1 - mn1)
         |      * 255) ELSE 0.0 END)) AS BIGINT) AS q1
         | FROM lineitem, s)
         |SELECT l_orderkey, l_linenumber, $inter AS z,
         | ($inter) >> 12 AS bucket
         |FROM q""".stripMargin
    },
    "q_salted" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        | count(l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | round(min(CAST($c AS DOUBLE)), 6) AS min_value,
         | round(max(CAST($c AS DOUBLE)), 6) AS max_value,
         | round(avg(CAST($c AS DOUBLE)), 6) AS avg_value
         |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n"),
    "q_minmax" ->
      """SELECT l_orderkey, l_linenumber,
        | round(CASE WHEN mx - mn < 1e-10 THEN 0.5
        |   ELSE (l_extendedprice - mn) / (mx - mn) END, 6) AS price_scaled
        |FROM lineitem,
        | (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem)""".stripMargin,

    "q_qbin" ->
      """WITH v AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |    round(CAST(l_extendedprice AS DOUBLE), 6) AS x
        |  FROM lineitem),
        |cuts AS (SELECT l_returnflag,
        |    [round(quantile_cont(x, 0.25), 6),
        |     round(quantile_cont(x, 0.5), 6),
        |     round(quantile_cont(x, 0.75), 6)] AS qs
        |  FROM v GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CASE WHEN x IS NULL THEN NULL
        |    ELSE 1 + len(list_filter(qs, q -> x > q)) END AS bin
        |FROM v JOIN cuts USING (l_returnflag)""".stripMargin
  )
}
