package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared corpus tokenization `regexp_extract_all(lower(text),
  * '[a-z0-9_]+', 0)` as ONE native kernel: lowercase once (the same
  * `UTF8String.toLowerCase` Spark's `Lower` calls), then a linear BYTE
  * scan for maximal runs of `[a-z0-9_]` — no regex engine, no
  * per-match java.util.regex machinery. Byte scanning is exact for
  * this pattern: the class is pure ASCII and UTF-8 continuation/lead
  * bytes of non-ASCII characters all have the high bit set, so they
  * can never be inside a match — the runs found are precisely the
  * regex's matches on the lowered string, for ANY input
  * (WordKernelSpec pins kernel ≡ regex composition, non-ASCII and
  * empty cases included). Tokenization is the top per-row cost of the
  * whole corpus family (quality stats, n-gram dedup, heavy hitters,
  * LM scoring all start here), which is what justifies the kernel.
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope. */
case class WordTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_tokens requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "word_tokens"
}

object WordTokens {
  import org.apache.spark.sql.Column
  def apply(text: Column): Column =
    ColumnBridge.column(WordTokensExpr(ColumnBridge.expression(text)))

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  def compute(text: UTF8String): GenericArrayData = {
    val lower = text.toLowerCase
    val b = lower.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val n = b.length
    while (i < n) {
      if (isWord(b(i))) {
        val start = i
        while (i < n && isWord(b(i))) i += 1
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(b, start, i)))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Per-document token frequencies `array<struct<token,cnt>>` in the
  * SAME single byte scan as [[WordTokensExpr]]: maximal `[a-z0-9_]`
  * runs of the lowered text, counted into an insertion-ordered map as
  * they are found (first-occurrence order — deterministic). One row
  * per DISTINCT per-doc token replaces one row per occurrence, so a
  * downstream `groupBy(token)` needs only ONE vocabulary-keyed
  * exchange where `explode(word_tokens) → count / count(distinct
  * doc_id)` needed a corpus-token-sized `(token, doc_id)` exchange
  * first: `sum(cnt) ≡ count(occurrences)` and, for unique input rows,
  * `count(rows) ≡ count(distinct doc_id)` — integer arithmetic, exact.
  * Null text → null (explode drops it), matching `word_tokens`. */
case class WordTokenCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_token_counts requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordTokenCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordTokenCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "word_token_counts"
}

object WordTokenCounts {
  import org.apache.spark.sql.Column
  def apply(text: Column): Column =
    ColumnBridge.column(WordTokenCountsExpr(ColumnBridge.expression(text)))

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  def compute(text: UTF8String): GenericArrayData = {
    val lower = text.toLowerCase
    val b = lower.getBytes
    // insertion-ordered: first-occurrence order, same for every run
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    val n = b.length
    while (i < n) {
      if (isWord(b(i))) {
        val start = i
        while (i < n && isWord(b(i))) i += 1
        val tok = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(b, start, i))
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
      } else i += 1
    }
    val out = new Array[AnyRef](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Overlapping word n-grams joined with single spaces, as a native
  * kernel — value-identical to the staged form
  * `transform(sequence(1, greatest(size(w)-(g-1), 1)), i ->
  * concat_ws(" ", element_at(w, i), …))` (higher-order functions run
  * as interpreted CodegenFallback with per-element boxing; this is one
  * codegen'd pass). Fewer than `g` tokens → empty array, matching the
  * staged form's when-guard; a null ELEMENT is skipped inside its
  * gram, matching concat_ws's null-skipping (word arrays never hold
  * nulls, but equality must not depend on that). Callers wrap with
  * coalesce(…, []) to reproduce the staged form's empty-on-null-ARRAY. */
case class WordNgramsExpr(child: Expression, g: Int)
    extends UnaryExpression {
  require(g >= 1, s"word_ngrams g=$g")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"word_ngrams requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], g)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgrams.compute($c, $g)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  import org.apache.spark.sql.Column
  def apply(w: Column, g: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(w), g))

  private val SPACE = UTF8String.fromString(" ")

  def compute(words: ArrayData, g: Int): GenericArrayData = {
    val n = words.numElements()
    val count = n - g + 1
    if (count <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (words.isNullAt(i)) null
        else words.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](count)
    var p = 0
    while (p < count) {
      // concat_ws semantics: null members are skipped, empties kept
      val parts = new java.util.ArrayList[UTF8String](g)
      var o = 0
      while (o < g) {
        val t = toks(p + o)
        if (t != null) parts.add(t)
        o += 1
      }
      out(p) = UTF8String.concatWs(SPACE,
        parts.toArray(new Array[UTF8String](parts.size())): _*)
      p += 1
    }
    new GenericArrayData(out)
  }
}
