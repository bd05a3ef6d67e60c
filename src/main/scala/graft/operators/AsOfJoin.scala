package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * rightTime <= leftTime within the same key (the time-series join the
  * reference's panel model implies but never needed in-process).
  *
  * Implemented as UNION + window, not a range join: tag both sides, union
  * them, sort per key by (time, side-tag), and carry the right side's
  * payload forward with `last(..., ignoreNulls)` over an unbounded-
  * preceding frame. ONE hash exchange on the key and one sort — a
  * BroadcastNestedLoopJoin (what a naive t1 >= t2 join plans to) would be
  * quadratic and non-distributable at 100 TB. Ties (equal timestamps)
  * resolve to the right row, matching standard ASOF semantics
  * (left.ts >= right.ts).
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried onto each left row
    *                   (null when no right row precedes it). */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right (sorts before left on equal time, so last() sees it)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__v_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .select((keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c =>
          last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)) :+
        col("__side")): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }
}
