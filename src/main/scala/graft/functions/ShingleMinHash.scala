package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The COMPLETE minhash signature pipeline — character k-gram shingles →
  * md5 → double-hash family h_i = h1 + i·h2 → per-function minimums —
  * fused into one expression over the normalized text.
  *
  * Equivalent to the composed form
  * `minhash_sigs(transform(shingles, md5-chunk …))` but with no
  * intermediate arrays and no interpreted lambda machinery (higher-order
  * functions are CodegenFallback — every per-shingle step of the staged
  * chain ran interpreted with boxing). Two exactness notes:
  *
  *  - Shingle DEDUP is intentionally absent: a minimum over a multiset
  *    equals the minimum over its set, so `array_distinct` cannot change
  *    any h_i — the values are identical to the distinct-shingle oracle.
  *  - h1/h2 are hex digits [1,10] and [11,20] of md5 — digit-aligned to
  *    BYTES [0,5) and [5,10), read big-endian, exactly
  *    `conv(substring(md5(s), start, 10), 16, 10)`.
  *
  * Shingle positions are 1..max(len−k+1, 1) (SQL substring clamps, so a
  * sub-k-length text contributes itself as its only shingle), matching
  * `nGramShingles`.
  */
case class ShingleMinHashExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size k=$k")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes=$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_minhash requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleMinHash.compute(
      input.asInstanceOf[UTF8String], k, numHashes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleMinHash.compute($c, $k, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "shingle_minhash"
}

object ShingleMinHash {
  import org.apache.spark.sql.Column
  def apply(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(ShingleMinHashExpr(ColumnBridge.expression(text),
      k, numHashes))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 40-bit big-endian value of bytes [off, off+5) — the integer value of
    * hex digits [2·off+1, 2·off+10] of the digest. */
  private def chunk40(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 5) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  def compute(text: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = text.numChars()
    val positions = math.max(n - k + 1, 1)
    val md = digest.get()
    var p = 1
    while (p <= positions) {
      // SQL substring semantics (1-based, clamped) — same shingles as
      // nGramShingles' transform(sequence(...), i -> substring(t, i, k))
      val sh = text.substringSQL(p, k)
      md.reset()
      val d = md.digest(sh.getBytes)
      val h1 = chunk40(d, 0)
      val h2 = chunk40(d, 5)
      var i = 0
      while (i < numHashes) {
        val v = h1 + i * h2
        if (v < out(i)) out(i) = v
        i += 1
      }
      p += 1
    }
    out
  }
}
