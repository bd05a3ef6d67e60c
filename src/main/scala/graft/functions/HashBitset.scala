package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Fixed-width hash bitset — the membership prefilter for joins whose
  * build side is too large to broadcast as a hash relation.
  *
  * `hash_bitset(h)` aggregates 24-bit (by default) hash prefixes into a
  * 2 MiB bit array; [[HashBitsetContains]] probes it as a codegen'd
  * scalar. Together they are a one-hash Bloom filter with a DETERMINISTIC
  * layout: bit i is set iff some build-side value hashed to prefix i, so
  * behavior is reproducible across engines and runs (no seed, no
  * fpp-driven sizing). False positives pass the prefilter and are removed
  * by the exact join that follows — the filter changes no results, only
  * how many probe rows reach the join's exchange.
  *
  * Scale shape: the aggregate is a TypedImperativeAggregate whose
  * partials OR together map-side, so the build side is ONE pass and the
  * merged bitset is a single bounded scalar (2 MiB regardless of build
  * cardinality — at 16M+ distinct prefixes it saturates and degrades
  * gracefully toward pass-through). The probe is a pure projection. This
  * is the same decomposition Spark uses for its own
  * `DataFrameStatFunctions.bloomFilter` + runtime row-group filters,
  * specialized to the repo's portable md5 hash family so the DuckDB
  * oracles stay engine-exact.
  */
object HashBitset {
  /** Aggregate a LongType hash column into a bitset over the low
    * `bits` bits (default 24 → 2 MiB). */
  def agg(c: Column, bits: Int = 24): Column =
    ColumnBridge.column(
      HashBitsetAgg(ColumnBridge.expression(c), bits).toAggregateExpression())

  /** Membership probe of `c`'s low `bits` bits against `bitset`. */
  def contains(bitset: Array[Byte], c: Column, bits: Int = 24): Column =
    ColumnBridge.column(
      HashBitsetContains(bitset, ColumnBridge.expression(c), bits))
}

case class HashBitsetAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 6 && bits <= 28, s"hash_bitset bits out of range: $bits")
  private val words = 1 << (bits - 6)
  private val mask = (1L << bits) - 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hash_bitset"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_bitset requires a bigint input, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = (v.asInstanceOf[Long] & mask).toInt
      buf(h >>> 6) |= 1L << (h & 63)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * words)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): HashBitsetAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HashBitsetAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `bitset[h & mask]` as a codegen'd boolean scalar. The bitset rides the
  * expression as a reference object (addReferenceObj) — part of the
  * task-binary broadcast, never stringified into generated code. */
case class HashBitsetContains(bitset: Array[Byte], child: Expression,
    bits: Int) extends UnaryExpression {

  private val mask = (1L << bits) - 1
  @transient private lazy val wordsArr: Array[Long] = {
    val out = new Array[Long](bitset.length / 8)
    java.nio.ByteBuffer.wrap(bitset).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "hash_bitset_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_bitset_contains requires a bigint input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val h = (v.asInstanceOf[Long] & mask).toInt
    (wordsArr(h >>> 6) & (1L << (h & 63))) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bitsetWords", wordsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |int $h = (int) ($c & ${mask}L);
         |${ev.value} = ($arr[$h >>> 6] & (1L << ($h & 63))) != 0L;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
