package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graft.ColumnBridge

/** Native dot product over dense numeric array columns (Float or Double
  * elements on either side, independently).
  *
  * This is THE hot kernel of every similarity operator (cosine top-k,
  * IVF search, SRP bucketing, near-dup checks). The alternatives both
  * lose at scale: a higher-order `aggregate(zip_with(...))` never enters
  * whole-stage codegen (interpreted lambda per element), and an unrolled
  * `element_at` chain blows past janino's method-size limit around a
  * thousand terms and ships a multi-megabyte plan with every task. A
  * single codegen'd loop is compact, branch-free, and stays inside the
  * stage.
  *
  * Accumulation is index-ascending starting from 0.0 — numerically
  * IDENTICAL to the left-associated explicit chain the DuckDB oracle SQL
  * writes (0.0 + t₁ ≡ t₁), so swapping this in changes no oracle.
  * Vectors must be dense (no null elements) and of equal length.
  */
object VecDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotExpr(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"vec_dot length mismatch: $n vs ${y.numElements()}")
    val lf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def get(e: Expression, v: String, i: String) =
      if (e.dataType.asInstanceOf[ArrayType].elementType == FloatType)
        s"(double) $v.getFloat($i)"
      else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh names: several vec_dot instances can land in ONE codegen
      // function (dot + norms in a single projection); fixed names make
      // janino reject the class and the whole stage falls back to the
      // interpreted path.
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot length mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(left, a, i)} * ${get(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}
