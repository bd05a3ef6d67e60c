package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  LongType, StructField, StructType}

/** Bounded partial top-k: `topk_by(score, id, k)` keeps the k best
  * (score DESC, id ASC) pairs per aggregation buffer and emits them
  * best-first as `array<struct<score double, id bigint>>`.
  *
  * This is the shuffle-light form of the per-group keep-top-N pattern
  * (RefinedWeb §3.1-style per-domain caps, "best N docs per source").
  * The window formulation —
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC)` — shuffles and
  * SORTS every row of every group to rank rows it then throws away; for
  * a 100 TB corpus capped at a few hundred docs per domain that is
  * almost the entire corpus through the exchange. As a
  * TypedImperativeAggregate the top-k buffer partial-aggregates
  * map-side like any agg: each task forwards at most k rows per group
  * it saw, the merge is a bounded heap union, and the exchange carries
  * O(groups × k) — independent of corpus size.
  *
  * Determinism: the comparator is total ((score, id) pairs never tie as
  * ids are distinct), so the result is a pure function of the input
  * multiset — any partial-aggregation order yields the same array,
  * which is what lets the window-based DuckDB oracle match bit for bit.
  * Null scores, NaN scores and null ids do not compete (skipped on
  * update — NaN has no place in a total (score, id) order).
  *
  * No reference analog (centimators has no corpus layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object TopKBy {
  def topkBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}

case class TopKByAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1 && k <= 1000000, s"topk_by k out of range: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by requires (double, bigint), got " +
        s"(${score.dataType}, ${id.dataType})")

  // worst-first ordering: the queue's head is the entry to evict —
  // lowest score, ties broken toward the HIGHER id (id ASC wins)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      // total-order comparison (java.lang.Double.compare) so eviction
      // agrees with the queue's Ordering[Double] — an IEEE `s > ws` is
      // false against a NaN head, which would make a NaN entry the
      // permanent head rejecting every later (better) score
      val cmp = java.lang.Double.compare(s, ws)
      if (cmp > 0 || (cmp == 0 && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    // NaN scores do not compete, same contract as nulls: topk_by is a
    // registered SQL function over doubles, so NaN (0.0/0.0 in a score
    // expression) is reachable even though current call sites cast longs
    if (sv != null && iv != null && !sv.asInstanceOf[Double].isNaN)
      offer(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => offer(b1, s, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first: score DESC, id ASC
    val arr = buf.toArray
    java.util.Arrays.sort(arr, Ordering.by[(Double, Long), (Double, Long)] {
      case (s, i) => (-s, i)
    })
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    }: Array[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}
