package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram shingle set as a SORTED array of distinct 64-bit
  * hashes, fused into one codegen'd kernel: shingle → md5 → first 8
  * digest bytes (big-endian signed long) → sort → dedup.
  *
  * Replaces the interpreted chain `array_sort(array_distinct(
  * transform(sequence(…), i -> hash(substring(t, i, k)))))` — all
  * higher-order functions, i.e. CodegenFallback with per-element boxing,
  * plus two intermediate arrays. The exact hash VALUES are free to
  * differ from any SQL builtin: set sizes and intersections — the only
  * things Jaccard consumes — are invariant under any injective hash
  * (64-bit ⇒ cross-doc collision odds ~2⁻⁶⁴·|shingles|²), which is also
  * why the DuckDB oracle mirrors the Jaccard on raw strings rather than
  * hash values. Output feeds [[SortedIntersectSize]] directly.
  *
  * Positions are 1..max(len−k+1, 1) (SQL substring clamps; sub-k text
  * contributes itself), matching `nGramShingles`.
  */
case class SortedShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size k=$k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_shingle_hashes requires a string input, got " +
          s"${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SortedShingleHashes.compute(
      input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SortedShingleHashes.compute($c, $k))")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "sorted_shingle_hashes"
}

object SortedShingleHashes {
  import org.apache.spark.sql.Column
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(SortedShingleHashesExpr(
      ColumnBridge.expression(text), k))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String, k: Int): Array[Long] = {
    val n = text.numChars()
    val positions = math.max(n - k + 1, 1)
    val md = digest.get()
    val raw = new Array[Long](positions)
    var p = 1
    while (p <= positions) {
      md.reset()
      val d = md.digest(text.substringSQL(p, k).getBytes)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      raw(p - 1) = v
      p += 1
    }
    java.util.Arrays.sort(raw)
    // compact duplicates in place (sorted ⇒ dups are adjacent)
    var w = 0
    var r = 0
    while (r < positions) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == positions) raw else java.util.Arrays.copyOf(raw, w)
  }
}
