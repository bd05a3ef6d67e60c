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
    *                   (null when no right row precedes it).
    *
    * The right payload travels as ONE non-null struct, so a right row
    * whose value column is legitimately NULL still matches (and masks
    * older rows) instead of being skipped by `ignoreNulls` — "no
    * preceding right row" and "preceding right row with null value" are
    * distinct outcomes. Duplicate (key, ts) right rows resolve
    * deterministically to the greatest payload struct (the window orders
    * by the struct as a final tiebreak). */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val rvType = StructType(valueCols.map(c => right.schema(c)).toArray)
    // side 0 = right (sorts before left on equal time, so last() sees it)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => col("__last").getField(c).as(c)): _*)
  }
}
