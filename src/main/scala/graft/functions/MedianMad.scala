package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused exact median + median-absolute-deviation aggregate.
  *
  * `median_mad(x)` returns `array(median(x), median(abs(x - median(x))))`
  * with the same linear-interpolation estimator as Spark's `percentile`
  * (see [[DoubleVecAggregate.interpolate]]), which is the estimator
  * DuckDB's `quantile_cont` implements — so the robust scaler built on
  * this stays bit-stable against the SQL oracle.
  *
  * Why a custom aggregate: MAD needs the median first, so the composable
  * formulation is two grouped `percentile` aggregates with a re-scan and
  * a second all-values shuffle between them (reference semantics:
  * centimators scales features via narwhals expression pipelines; a
  * robust variant composes the same way). Fusing them buffers each
  * group's values ONCE — one scan, one shuffle, both statistics probed
  * from the same sorted array at eval. Scale shape: see
  * [[DoubleVecAggregate]] (bounded-cardinality groups; sketches are the
  * unbounded-group path).
  */
case class MedianMadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends DoubleVecAggregate {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "median_mad"

  override def eval(buf: DoubleVec): Any = {
    if (buf.n == 0) null
    else {
      val arr = buf.sorted()
      val med = DoubleVecAggregate.interpolate(arr, 0.5)
      var i = 0
      while (i < arr.length) { arr(i) = math.abs(arr(i) - med); i += 1 }
      java.util.Arrays.sort(arr)
      val mad = DoubleVecAggregate.interpolate(arr, 0.5)
      new GenericArrayData(Array(med, mad))
    }
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
