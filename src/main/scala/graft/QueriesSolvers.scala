package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Gaussianizer
import graft.solvers.{FeatureNeutralizer, FeaturePenalizer}

/** Gaussianize / neutralize / penalize queries (SURVEY.md §2.6, §2.9).
  *
  * The gaussianize and single-feature-neutralize queries carry FULL DuckDB
  * oracles: the probit is Acklam's rational approximation whose arithmetic
  * is reproduced operation-for-operation in SQL (same Horner order, same
  * coefficients → identical doubles up to libm ln/sqrt last-ulp noise,
  * absorbed by round(6)). The multi-feature neutralizer and the iterative
  * penalizer are not SQL-expressible → rows-only checks; their semantics
  * are pinned by SolverSpec property tests instead (the reference's own
  * correctness bar: exposure reduction / cap, output in [0,1];
  * tests/test_neutralization.py:83-205,
  * tests/test_penalizer_comparison.py:250-298).
  */
object QueriesSolvers {

  /** lineitem with a monthly era and a deterministic unique row id.
    *
    * The synthetic lineitem has NO unique natural key ((l_orderkey,
    * l_linenumber) collides; only full rows are distinct), so the id is
    * (year*12+month)*1e5 + row_number over the full column tuple WITHIN the
    * era — a partitioned window (scales; no global sort), reproducible
    * identically in the DuckDB oracle. */
  private val allCols = Seq("l_shipdate", "l_orderkey", "l_linenumber",
    "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus")

  private def li(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("era").orderBy(allCols.map(col): _*)
    s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("era", date_format(col("l_shipdate"), "yyyy-MM"))
      .withColumn("rid",
        ((year(col("l_shipdate")) * 12 + month(col("l_shipdate"))) * 100000L
          + row_number().over(w)).cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gaussianize" -> ((s, dir) => {
      Gaussianizer(Seq("l_extendedprice"), "era", Seq("rid"))
        .transform(li(s, dir))
        .select(col("rid"),
          round(col("l_extendedprice_gauss"), 6).as("price_gauss"))
    }),

    // the queries consume only (rid, outputs) → outputsOnly skips the
    // transformer's full-width join back to the input
    "q_neutralize_1f" -> ((s, dir) => {
      FeatureNeutralizer(Seq("l_extendedprice"), Seq("l_quantity"),
        Seq(0.5), "era", "rid")
        .outputsOnly(li(s, dir))
        .select(col("rid"),
          round(col("`l_extendedprice_neutralized_0.5`"), 6).as("price_neut"))
    }),

    "q_neutralize" -> ((s, dir) => {
      FeatureNeutralizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), Seq(0.5, 1.0), "era", "rid")
        .outputsOnly(li(s, dir))
        .select(col("rid"),
          round(col("`l_extendedprice_neutralized_0.5`"), 6).as("neut_half"),
          round(col("`l_extendedprice_neutralized_1.0`"), 6).as("neut_full"))
    }),

    "q_penalize" -> ((s, dir) => {
      FeaturePenalizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), Seq(0.1), "era", "rid",
        maxIters = 10000)
        .outputsOnly(li(s, dir))
        .select(col("rid"),
          round(col("`l_extendedprice_penalized_0.1`"), 6).as("price_pen"))
    })
  )

  /** Acklam Φ⁻¹ as a SQL expression over probability expression `p` —
    * operation-for-operation mirror of InverseNormalCdf.compute. */
  def acklamSql(p: String): String = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
      2.506628277459239e+00).map(_.toString)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
      .map(_.toString)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
      2.938163982698783e+00).map(_.toString)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00).map(_.toString)
    def hornerC(q: String) =
      s"((((((${c(0)} * $q + ${c(1)}) * $q + ${c(2)}) * $q + ${c(3)}) * $q + ${c(4)}) * $q + ${c(5)})" +
        s" / ((((${d(0)} * $q + ${d(1)}) * $q + ${d(2)}) * $q + ${d(3)}) * $q + 1.0))"
    val lowQ = s"sqrt(-2.0 * ln($p))"
    val highQ = s"sqrt(-2.0 * ln(1.0 - ($p)))"
    val q = s"(($p) - 0.5)"
    val r = s"($q * $q)"
    val centralNum =
      s"(((((${a(0)} * $r + ${a(1)}) * $r + ${a(2)}) * $r + ${a(3)}) * $r + ${a(4)}) * $r + ${a(5)}) * $q"
    val centralDen =
      s"(((((${b(0)} * $r + ${b(1)}) * $r + ${b(2)}) * $r + ${b(3)}) * $r + ${b(4)}) * $r + 1.0)"
    s"""CASE
       | WHEN ($p) < 0.02425 THEN ${hornerC(lowQ)}
       | WHEN ($p) <= 0.97575 THEN ($centralNum / $centralDen)
       | ELSE -${hornerC(highQ)}
       |END""".stripMargin
  }

  // Shared oracle CTE: row id, monthly era, ordinal-rank gaussianized price.
  private val gaussCte = {
    val p = "(CAST(rn AS DOUBLE) - 0.5) / n"
    s"""WITH base AS (
       |  SELECT (year(l_shipdate) * 12 + month(l_shipdate)) * 100000
       |           + row_number() OVER (
       |               PARTITION BY strftime(l_shipdate, '%Y-%m')
       |               ORDER BY ${allCols.mkString(", ")}) AS rid,
       |         strftime(l_shipdate, '%Y-%m') AS era,
       |         l_extendedprice, l_quantity, l_discount, l_tax
       |  FROM lineitem
       |), ranked AS (
       |  SELECT rid, era, l_quantity, l_discount, l_tax,
       |    row_number() OVER (PARTITION BY era
       |      ORDER BY l_extendedprice, rid) AS rn,
       |    count(*) OVER (PARTITION BY era) AS n
       |  FROM base
       |), gauss AS (
       |  SELECT rid, era, l_quantity, l_discount, l_tax, ${acklamSql(p)} AS g
       |  FROM ranked
       |)""".stripMargin
  }

  /** q_neutralize oracle: the per-era 3-feature no-intercept lstsq is the
    * 3×3 normal-equation solve — Cramer's rule over the era's Gram sums
    * (first-row cofactor expansion), then the same subtract / per-era-std
    * / global-min-max pipeline as the 1-feature oracle. */
  private val neutralize3fSql: String = {
    val minmax = (v: String) =>
      s"""CASE WHEN max($v) OVER () - min($v) OVER () < 1e-10 THEN 0.5
         |    ELSE ($v - min($v) OVER ()) / (max($v) OVER () - min($v) OVER ())
         |  END""".stripMargin
    s"""$gaussCte, gram AS (
       |  SELECT rid, era, g,
       |    l_quantity AS x, l_discount AS y, l_tax AS z,
       |    sum(l_quantity * l_quantity) OVER w AS sxx,
       |    sum(l_quantity * l_discount) OVER w AS sxy,
       |    sum(l_quantity * l_tax) OVER w AS sxz,
       |    sum(l_discount * l_discount) OVER w AS syy,
       |    sum(l_discount * l_tax) OVER w AS syz,
       |    sum(l_tax * l_tax) OVER w AS szz,
       |    sum(l_quantity * g) OVER w AS cx,
       |    sum(l_discount * g) OVER w AS cy,
       |    sum(l_tax * g) OVER w AS cz
       |  FROM gauss
       |  WINDOW w AS (PARTITION BY era)
       |), beta AS (
       |  SELECT rid, era, g, x, y, z,
       |    (cx*(syy*szz - syz*syz) - sxy*(cy*szz - syz*cz)
       |      + sxz*(cy*syz - syy*cz))
       |      / (sxx*(syy*szz - syz*syz) - sxy*(sxy*szz - syz*sxz)
       |         + sxz*(sxy*syz - syy*sxz)) AS bx,
       |    (sxx*(cy*szz - cz*syz) - cx*(sxy*szz - syz*sxz)
       |      + sxz*(sxy*cz - cy*sxz))
       |      / (sxx*(syy*szz - syz*syz) - sxy*(sxy*szz - syz*sxz)
       |         + sxz*(sxy*syz - syy*sxz)) AS by,
       |    (sxx*(syy*cz - cy*syz) - sxy*(sxy*cz - cy*sxz)
       |      + cx*(sxy*syz - syy*sxz))
       |      / (sxx*(syy*szz - syz*syz) - sxy*(sxy*szz - syz*sxz)
       |         + sxz*(sxy*syz - syy*sxz)) AS bz
       |  FROM gram
       |), neut AS (
       |  SELECT rid, era,
       |    g - 0.5 * (x*bx + y*by + z*bz) AS v1,
       |    g - 1.0 * (x*bx + y*by + z*bz) AS v2
       |  FROM beta
       |), std AS (
       |  SELECT rid,
       |    v1 / stddev_pop(v1) OVER (PARTITION BY era) AS v1,
       |    v2 / stddev_pop(v2) OVER (PARTITION BY era) AS v2
       |  FROM neut
       |)
       |SELECT rid,
       |  round(${minmax("v1")}, 6) AS neut_half,
       |  round(${minmax("v2")}, 6) AS neut_full
       |FROM std""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_neutralize" -> neutralize3fSql,
    "q_gaussianize" ->
      s"""$gaussCte
         |SELECT rid, round(g, 6) AS price_gauss FROM gauss""".stripMargin,
    // Single-feature no-intercept lstsq: coef = Σxy/Σx² per era; subtract
    // 0.5·x·coef; standardize by per-era population std; global min-max.
    "q_neutralize_1f" ->
      s"""$gaussCte, neut AS (
         |  SELECT rid,
         |    g - 0.5 * l_quantity *
         |      (sum(l_quantity * g) OVER (PARTITION BY era)
         |       / sum(l_quantity * l_quantity) OVER (PARTITION BY era)) AS v,
         |    era
         |  FROM gauss
         |), std AS (
         |  SELECT rid, v / stddev_pop(v) OVER (PARTITION BY era) AS v FROM neut
         |)
         |SELECT rid,
         |  round(CASE WHEN max(v) OVER () - min(v) OVER () < 1e-10 THEN 0.5
         |    ELSE (v - min(v) OVER ()) / (max(v) OVER () - min(v) OVER ())
         |  END, 6) AS price_neut
         |FROM std""".stripMargin
  )
}
