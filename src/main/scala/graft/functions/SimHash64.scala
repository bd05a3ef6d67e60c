package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit simhash of a token array in one fused pass: per token
  * (duplicates included — they weight the vote), md5; hex digit i
  * (1..15) contributes ±1 votes to bits 4·(15−i)+b for each of the
  * digit's 4 bits b; the final bit is 1 where the vote is positive.
  *
  * Value-identical to the explode → 60-CASE-aggregate formulation it
  * replaces (same md5 digits, same vote, same bit positions) — and to
  * the DuckDB oracle's unnest/GROUP BY mirror — but with no token
  * explode and no per-document aggregation SHUFFLE: at corpus scale the
  * old plan moved |docs|·|tokens| rows through an exchange to take a
  * per-doc majority vote that one scan pass computes locally. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"simhash64 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  import org.apache.spark.sql.Column
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    val md = digest.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(t).getBytes)
      var i = 1
      while (i <= 15) {
        val byte = d((i - 1) / 2) & 0xff
        val digit = if (i % 2 == 1) byte >>> 4 else byte & 0xf
        val base = 4 * (15 - i)
        var b = 0
        while (b < 4) {
          if (((digit >> b) & 1) == 1) counts(base + b) += 1
          else counts(base + b) -= 1
          b += 1
        }
        i += 1
      }
      t += 1
    }
    var v = 0L
    var k = 0
    while (k < 60) { if (counts(k) > 0) v |= 1L << k; k += 1 }
    v
  }
}
