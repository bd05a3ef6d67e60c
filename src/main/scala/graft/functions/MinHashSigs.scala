package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graft.ColumnBridge

/** All `numHashes` minhash values in ONE fused pass over the per-shingle
  * hash arrays: out(i) = min_j (h1(j) + i·h2(j)) — the double-hash
  * family h_i = h1 + i·h2.
  *
  * The composed form (16 separate `array_min(zip_with(h1, h2, …))`
  * calls) allocates 16 intermediate arrays per document and runs 16
  * interpreted lambda passes; this kernel is a single codegen'd loop
  * with zero allocations beyond the output — the same
  * native-expression-over-HOF trade as [[VecDot]]. Identical values to
  * the composed form (plain long arithmetic, no overflow for
  * 40-bit h1/h2 and i ≤ 15), so the DuckDB oracle is unchanged.
  */
case class MinHashSigsExpr(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression {
  require(numHashes >= 1 && numHashes <= 16, s"numHashes=$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires array<bigint> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[ArrayData]
    val h2 = b.asInstanceOf[ArrayData]
    val n = h1.numElements()
    require(n == h2.numElements(),
      s"minhash_sigs length mismatch: $n vs ${h2.numElements()}")
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = h1.getLong(j); val y = h2.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = x + i * y
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "minhash_sigs length mismatch: " + $n + " vs "
         |      + $b.numElements());
         |}
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $a.getLong($j); long $y = $b.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $x + $i * $y;
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  import org.apache.spark.sql.Column
  def apply(h1: Column, h2: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigsExpr(ColumnBridge.expression(h1),
      ColumnBridge.expression(h2), numHashes))
}
