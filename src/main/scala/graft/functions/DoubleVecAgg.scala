package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Compact append-only double buffer (no boxing) for value-buffering
  * aggregates. Mirrors the information `percentile`'s buffer carries
  * (every group value) but stores primitive doubles in one growable
  * array instead of a boxed OpenHashMap — cheaper to build, merge, and
  * serialize.
  */
private[functions] final class DoubleVec(var arr: Array[Double], var n: Int) {
  def this() = this(new Array[Double](16), 0)
  def add(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v
    n += 1
  }
  def addAll(o: DoubleVec): Unit = {
    if (n + o.n > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(n + o.n, arr.length * 2))
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
  /** Sorted copy of the live prefix. */
  def sorted(): Array[Double] = {
    val a = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(a)
    a
  }
}

/** Base for aggregates whose state is "every non-null double of the
  * group": buffering, merge, and (de)serialization are shared;
  * subclasses implement `eval` over the collected values. Same
  * per-group memory shape as Spark's exact `percentile` (partial
  * buffers merge map-side), so the same scale guidance applies —
  * bounded-cardinality groups, with sketches as the unbounded path. */
abstract class DoubleVecAggregate extends TypedImperativeAggregate[DoubleVec] {

  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType}; " +
        "wrap in cast(x as double)")

  override def createAggregationBuffer(): DoubleVec = new DoubleVec()

  override def update(buf: DoubleVec, input: InternalRow): DoubleVec = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: DoubleVec, b2: DoubleVec): DoubleVec = {
    b1.addAll(b2)
    b1
  }

  override def serialize(buf: DoubleVec): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleVec = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleVec(arr, n)
  }
}

object DoubleVecAggregate {
  /** Linear-interpolation percentile of a SORTED array — the exact
    * formula Spark's Percentile.getPercentile evaluates (and the
    * estimator DuckDB's quantile_cont implements): rank p·(n−1),
    * value (hi−rank)·v[lo] + (rank−lo)·v[hi]. */
  def interpolate(sorted: Array[Double], p: Double): Double = {
    val rank = (sorted.length - 1) * p
    val lo = rank.toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) sorted(lo)
    else (hi - rank) * sorted(lo) + (rank - lo) * sorted(hi)
  }
}
