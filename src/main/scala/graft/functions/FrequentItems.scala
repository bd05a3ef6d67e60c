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
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items candidate sketch (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * `mg_candidates(token, k)` maintains at most `k` counters per
  * aggregation buffer. An arriving item increments its counter, opens a
  * new one if a slot is free, or — when all `k` slots are taken by OTHER
  * items — decrements every counter by one (dropping zeros). Merging
  * two summaries adds counters, then subtracts the (k+1)-largest count
  * from all and drops the non-positive ones. Both operations preserve
  * the sketch guarantee: any item with true frequency > N/(k+1) still
  * owns a counter in the merged summary, so with k >= 2/theta the
  * candidate array is a SUPERSET of every item with frequency >= theta*N.
  *
  * This is the scale half of exact heavy-hitter mining: a plain
  * `groupBy(token).count()` shuffles the full vocabulary (billions of
  * distinct tokens at 100 TB) to answer a question about a few hundred
  * of them. The sketch reduces the first pass to one bounded scalar per
  * task — partials merge map-side like any TypedImperativeAggregate —
  * and the follow-up EXACT count (see [[graft.text.HeavyHitters]])
  * touches only candidate tokens, whose post-partial-aggregation shuffle
  * is <= k rows per task by the same counter bound. The sketch can relay
  * FALSE candidates (its counts are estimates); the confirm pass counts
  * exactly, so the final result is sketch-independent and matches the
  * brute-force oracle bit for bit.
  *
  * Eval emits the candidate strings sorted lexicographically — the
  * output is a deterministic SET (any run order yields the same
  * surviving counters' keys is NOT guaranteed by MG in general, but the
  * confirm pass makes run-order differences unobservable; sorting here
  * just keeps plans and tests stable).
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object FrequentItems {
  def mgCandidates(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}

case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Array[Long]]] {

  require(k >= 1 && k <= 1000000, s"mg_candidates k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_candidates requires a string input, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Array[Long]] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Array[Long]],
      input: InternalRow): mutable.HashMap[UTF8String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String keys, NOT java Strings: the hot path (an occurrence
      // of an already-tracked token — the overwhelming majority, since
      // tracked tokens are the frequent ones) then does a hash probe on
      // the raw bytes with ZERO allocation; the per-occurrence
      // UTF-8 decode + String alloc of the previous version was the
      // kernel's top cost at corpus scale. eval()'s result may alias a
      // reused row buffer, so the key is CLONED exactly once, at first
      // insert — and counts live in MUTABLE one-element cells, so the
      // hot path increments in place and the possibly-aliased key is
      // NEVER handed back to the map (a map that replaced the stored
      // key on overwrite would otherwise corrupt the sketch).
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(cell) => cell(0) += 1
        case None if buf.size < k => buf.update(s.clone(), Array(1L))
        case None =>
          // all k slots taken by others: decrement everyone, drop zeros.
          // Each pass retires k+1 units of arrived count, so total work
          // across a partition is O(N) amortized.
          buf.filterInPlace((_, c) => c(0) > 1)
          buf.valuesIterator.foreach(c => c(0) -= 1)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Array[Long]],
      b2: mutable.HashMap[UTF8String, Array[Long]])
      : mutable.HashMap[UTF8String, Array[Long]] = {
    // b2's keys come from deserialize (freshly allocated, never aliased),
    // so adopting its cell on first sight is safe
    b2.foreach { case (s, c) =>
      b1.get(s) match {
        case Some(cell) => cell(0) += c(0)
        case None => b1.update(s, c)
      }
    }
    if (b1.size > k) {
      // subtract the (k+1)-largest count from all; <= k survive
      val counts = b1.valuesIterator.map(_(0)).toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      b1.filterInPlace((_, c) => c(0) > cut)
      b1.valuesIterator.foreach(c => c(0) -= cut)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Array[Long]]): Any =
    // sort as java Strings (<= k of them — cold path) so the emitted
    // order is byte-for-byte what the String-keyed version produced
    new GenericArrayData(
      buf.keysIterator.map(_.toString).toArray.sorted[String]
        .map(UTF8String.fromString(_)): Array[Any])

  override def serialize(
      buf: mutable.HashMap[UTF8String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c(0))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[UTF8String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Array[Long]]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), Array(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
