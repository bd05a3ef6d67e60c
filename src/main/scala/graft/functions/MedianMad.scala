package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Compact append-only double buffer (no boxing) for the median/MAD
  * aggregation state. Mirrors the layout `percentile`'s buffer carries
  * (every group value), but is built ONCE and probed for both the median
  * and the MAD, where the two-pass formulation builds it twice and pays
  * a second full scan + shuffle for the deviation pass.
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
}

/** Fused exact median + median-absolute-deviation aggregate.
  *
  * `median_mad(x)` returns `array(median(x), median(abs(x - median(x))))`
  * with the same linear-interpolation estimator as Spark's `percentile`
  * (rank p·(n−1); value = (hi−rank)·v[lo] + (rank−lo)·v[hi]), which is
  * the estimator DuckDB's `quantile_cont` implements — so the robust
  * scaler built on this stays bit-stable against the SQL oracle.
  *
  * Why a custom aggregate: MAD needs the median first, so the composable
  * formulation is two grouped `percentile` aggregates with a re-scan and
  * a second all-values shuffle between them (reference semantics:
  * centimators scales features via narwhals expression pipelines;
  * a robust variant composes the same way). Fusing them buffers each
  * group's values ONCE — one scan, one shuffle, both statistics probed
  * from the same sorted array at eval. Same per-group memory shape as
  * `percentile` (every value in the ObjectHashAggregate buffer, partial
  * merge map-side), so the same scale guidance applies: bounded-
  * cardinality groups only; the sketch path (`approx_percentile`) is the
  * unbounded-group fallback.
  */
case class MedianMadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleVec] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"median_mad requires a double input, got ${child.dataType}; " +
        "wrap in cast(x as double)")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "median_mad"

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

  override def eval(buf: DoubleVec): Any = {
    if (buf.n == 0) null
    else {
      val arr = java.util.Arrays.copyOf(buf.arr, buf.n)
      java.util.Arrays.sort(arr)
      val med = interpolate(arr)
      var i = 0
      while (i < arr.length) { arr(i) = math.abs(arr(i) - med); i += 1 }
      java.util.Arrays.sort(arr)
      val mad = interpolate(arr)
      new GenericArrayData(Array(med, mad))
    }
  }

  // p = 0.5 hardcoded: rank = (n-1)/2; two-sided weighted interpolation,
  // the exact formula Spark's Percentile.getPercentile evaluates.
  private def interpolate(sorted: Array[Double]): Double = {
    val rank = (sorted.length - 1) * 0.5
    val lo = rank.toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) sorted(lo)
    else (hi - rank) * sorted(lo) + (rank - lo) * sorted(hi)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MedianMadAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MedianMadAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MedianMad {
  /** `Column` surface: `MedianMad(col)` usable inside `groupBy(...).agg`. */
  def apply(c: Column): Column =
    ColumnBridge.column(
      MedianMadAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
