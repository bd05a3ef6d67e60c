package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Decimal rounding, bit-identical to Spark's `round(x, scale)` on
  * doubles, ~20x faster in the common case.
  *
  * Spark's `Round` evaluates
  * `BigDecimal.valueOf(x).setScale(scale, HALF_UP).doubleValue()` per
  * value — a Double.toString (shortest-decimal search), a BigDecimal
  * parse, a decimal division, and a decimal→binary conversion. On the
  * bench's 600k-row outputs the rounding of 6 stat columns alone costs
  * ~1.3s of single-core time (the sf0.1 tables are one parquet row
  * group, so pure-map output stages run in one task).
  *
  * Fast path: y = x·10^s; n = the integer y rounds to (HALF_UP);
  * result n/10^s. Both n and 10^s (s ≤ 15) are exactly representable,
  * so the final IEEE division is correctly rounded to the same double
  * BigDecimal's decimal→binary conversion produces. The only way the
  * fast path could disagree with BigDecimal is if the HALF_UP
  * comparison against .5 flips under the (bounded, ~2^-52 relative)
  * error of computing y in binary — so values whose fractional part
  * lies within a guard band of .5 take the EXACT BigDecimal path
  * instead. Outside the band the two computations provably agree;
  * inside it they are the same code. NaN/±Inf pass through (as Spark's
  * Round does); -0 normalizes to +0 (as BigDecimal does).
  *
  * The band is conservative: |y|·4.5e-16 (two 2^-53 relative errors —
  * the x·10^s product rounding and the shortest-decimal gap of x
  * itself — doubled for margin) plus 1e-12 absolute for subnormal-ish
  * y. Uniformly distributed values fall in the band with probability
  * ~1e-9, so the BigDecimal fallback is measurement noise.
  */
object FastRound {

  def compute(x: Double, pow10: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val y = x * pow10
    // beyond 2^52 every double is an integer multiple of 1 at this scale;
    // the float product may also have overflowed — take the exact path
    if (!(math.abs(y) < 4.503599627370496e15)) return slow(x, scale)
    val f = math.floor(y)
    val r = y - f
    val eps = math.abs(y) * 4.5e-16 + 1e-12
    if (math.abs(r - 0.5) <= eps) return slow(x, scale)
    val n = if (r > 0.5) f + 1.0 else f
    val q = n / pow10
    if (q == 0.0) 0.0 else q // BigDecimal has no -0
  }

  /** The exact Spark semantics (MathExpressions.Round, double branch). */
  def slow(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def apply(c: Column, scale: Int): Column =
    ColumnBridge.column(FastRoundExpr(ColumnBridge.expression(c), scale))
}

case class FastRoundExpr(child: Expression, scale: Int)
    extends UnaryExpression {
  require(scale >= 0 && scale <= 15,
    s"fast_round scale must be in [0, 15], got $scale")
  private val pow10: Double = math.pow(10.0, scale) // exact for scale <= 15

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fast_round requires double input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    FastRound.compute(input.asInstanceOf[Double], pow10, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastRound.compute($c, ${pow10}D, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fast_round"
}
