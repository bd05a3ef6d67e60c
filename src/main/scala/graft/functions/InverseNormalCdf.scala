package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graft.ColumnBridge

/** Inverse standard-normal CDF (probit, Φ⁻¹).
  *
  * Peter Acklam's rational approximation (public algorithm, relative error
  * < 1.15e-9 over (0,1)) — within the tolerance class the reference's own
  * correctness properties use for its gaussianizer
  * (reference: src/centimators/feature_transformers/base.py:10-14).
  * Deliberately kept as the plain two-branch rational form with Horner
  * polynomials: the identical arithmetic is reproducible in ANSI SQL, so
  * DuckDB-oracle queries can hash-match gaussianized outputs
  * (see QueriesCore.acklamSql).
  *
  * Implemented as a native Catalyst Expression with code generation so it
  * stays inside whole-stage codegen (no UDF/serialization overhead) — this
  * sits in the hot path of the per-era gaussianize step.
  */
object InverseNormalCdf {

  // Acklam coefficients.
  private val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
    2.506628277459239e+00)
  private val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
  private val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
    2.938163982698783e+00)
  private val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)

  private val pLow = 0.02425
  private val pHigh = 1.0 - pLow

  def compute(p: Double): Double = {
    if (p.isNaN) return Double.NaN
    if (p <= 0.0) return Double.NegativeInfinity
    if (p >= 1.0) return Double.PositiveInfinity
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= pHigh) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

  def apply(col: Column): Column =
    ColumnBridge.column(InverseNormalCdfExpr(ColumnBridge.expression(col)))
}

case class InverseNormalCdfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"inv_norm_cdf requires double input, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    InverseNormalCdf.compute(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.InverseNormalCdf.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "inv_norm_cdf"
}
