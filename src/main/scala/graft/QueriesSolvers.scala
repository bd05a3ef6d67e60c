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
  * tests/test_penalizer_comparison.py:250-298). The converged penalizer
  * additionally verifies under the driver gate through its per-era
  * convergence CERTIFICATE query (the same reference bar emitted as
  * boolean output columns — see q_penalize).
  */
object QueriesSolvers {

  // Shadows functions.round for the query outputs: bit-identical
  // HALF_UP decimal rounding via graft.functions.FastRound (native
  // codegen'd fast path; Spark's BigDecimal round costs ~1.3s/600k rows
  // of single-core time on multi-column outputs). SQL oracle strings
  // keep DuckDB's own round.
  private def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = graft.functions.FastRound(c, s)


  /** lineitem with a monthly era and a deterministic unique row id.
    *
    * The synthetic lineitem has NO unique natural key ((l_orderkey,
    * l_linenumber) collides; only full rows are distinct), so the id is
    * (year*12+month)*1e5 + row_number over the full column tuple WITHIN the
    * era — a partitioned window (scales; no global sort), reproducible
    * identically in the DuckDB oracle. */
  // Most-discriminating column FIRST: within an era every row shares the
  // month, so leading with l_shipdate (~30 distinct values per era) made
  // the sort comparator walk 3-4 fields per comparison. l_extendedprice
  // is near-unique, so comparisons short-circuit after one double —
  // measured ~25% off the era-window sort that every solver query pays.
  // The oracle CTE uses the same tuple, so rids stay consistent.
  private val allCols = Seq("l_extendedprice", "l_partkey", "l_suppkey",
    "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax",
    "l_shipdate", "l_returnflag", "l_linestatus")

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

    // converged mode under a STRUCTURAL full oracle: the per-era
    // convergence certificate (reference equivalence bar — final max
    // exposure ≤ cap + 0.01, improved loss, unit-interval outputs) plus
    // the genuinely recomputed (era, n); a non-converging run emits
    // false and fails the hash. Per-row values of the same optimizer are
    // value-checked by q_penalize_fixed's unrolled oracle.
    "q_penalize" -> ((s, dir) => {
      // reference-default iteration budget (penalization.py max_iters =
      // 100000): the Gram-domain loop is O(k²) per iteration, so even
      // slow small-era trajectories (~35k iters observed) cost nothing
      FeaturePenalizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), Seq(0.1), "era", "rid",
        maxIters = 100000)
        .certificate(li(s, dir))
        .select(col("era"), col("n"), col("exposure_ok"),
          col("loss_improved"), col("in_unit"), col("corr_ok"))
    }),

    // tol = 0 ⇒ EXACTLY `maxIters` Adamax updates, no early exit: the
    // same Gram-domain optimizer as q_penalize, made fully deterministic
    // so the 10 iterations unroll into the DuckDB oracle (every op in
    // the loop — mul/div/sqrt/max/compare — is IEEE-exact, so the SQL
    // trajectory reproduces the Scala one bit-for-bit given the era
    // aggregates). Full convergence stays covered by q_penalize +
    // SolverSpec's cap property.
    "q_penalize_fixed" -> ((s, dir) => {
      FeaturePenalizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), Seq(0.1), "era", "rid",
        maxIters = 10, tol = 0.0)
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

  /** q_penalize_fixed oracle: the 10-iteration Adamax trajectory in the
    * Gram domain, unrolled as a CTE chain — an operation-for-operation
    * mirror of Penalize.reduceExposure (same left-associated dot
    * products, same constants as Scala folds them, same relu-indicator
    * branches). The era-level state is (w, momentum, infinity-norm,
    * β₁^t); each iteration is a fixed block of scalar algebra over the
    * era's Gram aggregates. */
  private def penalizeFixedSql(iters: Int, maxExp: Double): String = {
    val (beta1, beta2, eps, lr) = (0.9, 0.999, 1e-7, 1e-3)
    val consts = "g11, g12, g13, g22, g23, g33, b1, b2, b3, ppc, " +
      "dinv1, dinv2, dinv3, rt1, rt2, rt3, rn1, rn2, rn3"
    // per-iteration block: sub-CTEs chained so each step can name its
    // intermediates (SQL SELECTs cannot reference their own aliases)
    def iter(t: Int): String = {
      val p = if (t == 0) "s0" else s"h${t - 1}"
      s"""a$t AS (SELECT *,
         |  ((g11 * w1) + (g12 * w2)) + (g13 * w3) AS gw1,
         |  ((g12 * w1) + (g22 * w2)) + (g23 * w3) AS gw2,
         |  ((g13 * w1) + (g23 * w2)) + (g33 * w3) AS gw3 FROM $p),
         |b$t AS (SELECT *, b1 - gw1 AS r1, b2 - gw2 AS r2, b3 - gw3 AS r3,
         |  (ppc - 2.0 * (((b1 * w1) + (b2 * w2)) + (b3 * w3)))
         |    + (((w1 * gw1) + (w2 * gw2)) + (w3 * gw3)) AS cn2 FROM a$t),
         |c$t AS (SELECT *, CASE WHEN cn2 > 0 THEN sqrt(cn2) ELSE 0.0 END
         |  AS cn FROM b$t),
         |d$t AS (SELECT *,
         |  CASE WHEN cn > 0 THEN (dinv1 * r1) / cn ELSE 0.0 END AS e1,
         |  CASE WHEN cn > 0 THEN (dinv2 * r2) / cn ELSE 0.0 END AS e2,
         |  CASE WHEN cn > 0 THEN (dinv3 * r3) / cn ELSE 0.0 END AS e3
         |  FROM c$t),
         |e$t AS (SELECT *,
         |  (CASE WHEN e1 > 0 AND e1 - rt1 > 0 THEN 1.0 ELSE 0.0 END)
         |   - (CASE WHEN -e1 > 0 AND -e1 - rn1 > 0 THEN 1.0 ELSE 0.0 END)
         |   AS gi1,
         |  (CASE WHEN e2 > 0 AND e2 - rt2 > 0 THEN 1.0 ELSE 0.0 END)
         |   - (CASE WHEN -e2 > 0 AND -e2 - rn2 > 0 THEN 1.0 ELSE 0.0 END)
         |   AS gi2,
         |  (CASE WHEN e3 > 0 AND e3 - rt3 > 0 THEN 1.0 ELSE 0.0 END)
         |   - (CASE WHEN -e3 > 0 AND -e3 - rn3 > 0 THEN 1.0 ELSE 0.0 END)
         |   AS gi3 FROM d$t),
         |f$t AS (SELECT *, dinv1 * gi1 AS dg1, dinv2 * gi2 AS dg2,
         |  dinv3 * gi3 AS dg3 FROM e$t),
         |g$t AS (SELECT *,
         |  (((r1 * dg1) + (r2 * dg2)) + (r3 * dg3)) / cn AS alpha,
         |  ((g11 * dg1) + (g12 * dg2)) + (g13 * dg3) AS gdg1,
         |  ((g12 * dg1) + (g22 * dg2)) + (g23 * dg3) AS gdg2,
         |  ((g13 * dg1) + (g23 * dg2)) + (g33 * dg3) AS gdg3 FROM f$t),
         |i$t AS (SELECT *, $beta1 * bp AS bp2,
         |  (-(gdg1 - r1 * (alpha / cn))) / cn AS gr1,
         |  (-(gdg2 - r2 * (alpha / cn))) / cn AS gr2,
         |  (-(gdg3 - r3 * (alpha / cn))) / cn AS gr3 FROM g$t),
         |j$t AS (SELECT *,
         |  mo1 * $beta1 + gr1 * ${1 - beta1} AS mo1n,
         |  mo2 * $beta1 + gr2 * ${1 - beta1} AS mo2n,
         |  mo3 * $beta1 + gr3 * ${1 - beta1} AS mo3n,
         |  greatest($beta2 * if1, abs(gr1)) AS if1n,
         |  greatest($beta2 * if2, abs(gr2)) AS if2n,
         |  greatest($beta2 * if3, abs(gr3)) AS if3n FROM i$t),
         |h$t AS (SELECT era, $consts,
         |  w1 - ($lr * (mo1n / (1.0 - bp2))) / (if1n + $eps) AS w1,
         |  w2 - ($lr * (mo2n / (1.0 - bp2))) / (if2n + $eps) AS w2,
         |  w3 - ($lr * (mo3n / (1.0 - bp2))) / (if3n + $eps) AS w3,
         |  mo1n AS mo1, mo2n AS mo2, mo3n AS mo3,
         |  if1n AS if1, if2n AS if2, if3n AS if3, bp2 AS bp FROM j$t)"""
        .stripMargin
    }
    val clampT = (j: Int) =>
      s"CASE WHEN pn > 0 THEN (dinv$j * b$j) / pn ELSE 0.0 END"
    s"""$gaussCte, f AS (
       |  SELECT rid, era, g, l_quantity - 0.5 AS f1,
       |    l_discount - 0.5 AS f2, l_tax - 0.5 AS f3
       |  FROM gauss
       |), mn AS (
       |  SELECT *, avg(f1) OVER w AS m1, avg(f2) OVER w AS m2,
       |    avg(f3) OVER w AS m3, avg(g) OVER w AS pm
       |  FROM f WINDOW w AS (PARTITION BY era)
       |), st AS (
       |  SELECT era,
       |    sum((f1 - m1) * (f1 - m1)) AS g11,
       |    sum((f1 - m1) * (f2 - m2)) AS g12,
       |    sum((f1 - m1) * (f3 - m3)) AS g13,
       |    sum((f2 - m2) * (f2 - m2)) AS g22,
       |    sum((f2 - m2) * (f3 - m3)) AS g23,
       |    sum((f3 - m3) * (f3 - m3)) AS g33,
       |    sum((f1 - m1) * (g - pm)) AS b1,
       |    sum((f2 - m2) * (g - pm)) AS b2,
       |    sum((f3 - m3) * (g - pm)) AS b3,
       |    sum((g - pm) * (g - pm)) AS ppc
       |  FROM mn GROUP BY era
       |), st2 AS (
       |  SELECT *,
       |    CASE WHEN sqrt(g11) > 0 THEN 1.0 / sqrt(g11) ELSE 0.0 END AS dinv1,
       |    CASE WHEN sqrt(g22) > 0 THEN 1.0 / sqrt(g22) ELSE 0.0 END AS dinv2,
       |    CASE WHEN sqrt(g33) > 0 THEN 1.0 / sqrt(g33) ELSE 0.0 END AS dinv3,
       |    sqrt(ppc) AS pn
       |  FROM st
       |), st3 AS (
       |  SELECT *,
       |    greatest(${-maxExp}, least($maxExp, ${clampT(1)})) AS t1,
       |    greatest(${-maxExp}, least($maxExp, ${clampT(2)})) AS t2,
       |    greatest(${-maxExp}, least($maxExp, ${clampT(3)})) AS t3
       |  FROM st2
       |), st4 AS (
       |  SELECT *,
       |    CASE WHEN t1 > 0 THEN t1 ELSE 0.0 END AS rt1,
       |    CASE WHEN t2 > 0 THEN t2 ELSE 0.0 END AS rt2,
       |    CASE WHEN t3 > 0 THEN t3 ELSE 0.0 END AS rt3,
       |    CASE WHEN -t1 > 0 THEN -t1 ELSE 0.0 END AS rn1,
       |    CASE WHEN -t2 > 0 THEN -t2 ELSE 0.0 END AS rn2,
       |    CASE WHEN -t3 > 0 THEN -t3 ELSE 0.0 END AS rn3
       |  FROM st3
       |), s0 AS (
       |  SELECT era, $consts,
       |    0.0 AS w1, 0.0 AS w2, 0.0 AS w3,
       |    0.0 AS mo1, 0.0 AS mo2, 0.0 AS mo3,
       |    0.0 AS if1, 0.0 AS if2, 0.0 AS if3, 1.0 AS bp
       |  FROM st4
       |),
       |${(0 until iters).map(iter).mkString(",\n")}
       |, pen AS (
       |  SELECT f.rid, f.era,
       |    f.g - (((f.f1 * h.w1) + (f.f2 * h.w2)) + (f.f3 * h.w3)) AS v
       |  FROM f JOIN h${iters - 1} h ON f.era = h.era
       |), sd AS (
       |  SELECT rid, v / stddev_pop(v) OVER (PARTITION BY era) AS v
       |  FROM pen
       |)
       |SELECT rid,
       |  round(CASE WHEN max(v) OVER () - min(v) OVER () < 1e-10 THEN 0.5
       |    ELSE (v - min(v) OVER ()) / (max(v) OVER () - min(v) OVER ())
       |  END, 6) AS price_pen
       |FROM sd""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // structural twin of the certificate: era partition + row count are
    // recomputed from the data; the convergence booleans must be true
    "q_penalize" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS era, count(*) AS n,
        |  true AS exposure_ok, true AS loss_improved, true AS in_unit,
        |  true AS corr_ok
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_neutralize" -> neutralize3fSql,
    "q_penalize_fixed" -> penalizeFixedSql(10, 0.1),
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
