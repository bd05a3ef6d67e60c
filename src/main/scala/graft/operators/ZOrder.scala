package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning —
  * the `OPTIMIZE ZORDER BY` shape of Delta/Iceberg table maintenance:
  * quantize each clustering column to `bits` levels, interleave the
  * bits into one Morton key, then range-partition + sort by that key so
  * rows close in EVERY clustered dimension land in the same files. A
  * min/max-pruned scan (parquet row-group stats, Delta file stats) then
  * skips most files for predicates on ANY prefix of the clustered
  * columns — at 100 TB this is the difference between scanning a table
  * and scanning a few percent of it for multi-column point/range
  * lookups.
  *
  * The key computation is deterministic integer arithmetic over
  * broadcast min/max scalars (linear quantization; Delta quantizes by
  * range-partition id, which depends on sampling — the linear form
  * trades a little skew resistance for engine-exact reproducibility, so
  * the whole key path verifies bit-for-bit against the DuckDB oracle).
  * Everything before the final range exchange is a codegen'd
  * projection; the one exchange IS the layout being produced.
  *
  * No reference analog (centimators has no storage layer); greenfield
  * SURVEY.md §7.6 scope — the write-side companion of the read-side
  * pushdown/pruning the engine already pins in PlanSpec.
  */
object ZOrder {

  /** Linear quantization of `c` to [0, 2^bits): floor((x−mn)/(mx−mn)·
    * (2^bits−1)), clamped; degenerate (mn == mx) columns map to 0. */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val levels = (1 << bits) - 1
    val q = when(mx > mn,
      floor((c.cast("double") - mn) / (mx - mn) * lit(levels)))
      .otherwise(lit(0.0))
    least(lit(levels.toDouble), greatest(lit(0.0), q)).cast("long")
  }

  /** Morton interleave: bit b of dimension d lands at position
    * b·ndims + d. The per-bit terms occupy disjoint positions, so the
    * sum IS the bitwise OR. */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    val d = qs.size
    require(bits * d <= 63,
      s"bits*dims = ${bits * d} exceeds 63: the Morton key would " +
        "overflow into the long sign bit and corrupt the sort order")
    val terms = for {
      b <- 0 until bits
      (q, di) <- qs.zipWithIndex
    } yield shiftleft(shiftrightunsigned(q, b).bitwiseAND(lit(1L)),
      b * d + di)
    terms.reduce(_ + _)
  }

  /** Append the Morton key of `cols` as `zCol` (min/max computed in one
    * broadcast scalar row). */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int,
      zCol: String = "z"): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c")))
    val scalars = df.agg(aggs.head, aggs.tail: _*)
    val qs = cols.map(c =>
      quantize(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    df.crossJoin(broadcast(scalars))
      .withColumn(zCol, interleave(qs, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** The full layout: Morton key, then ONE range exchange + in-partition
    * sort on it — the frame is ready for a stats-pruned parquet write. */
  def layout(df: DataFrame, cols: Seq[String], bits: Int,
      numPartitions: Int): DataFrame = {
    val z = withZ(df, cols, bits)
    z.repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
  }
}
