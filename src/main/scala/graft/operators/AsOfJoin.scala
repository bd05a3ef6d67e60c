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

  /** Hot-key-safe as-of join: identical semantics to [[asof]], computed
    * with the carry-forward split across TIME BUCKETS so a celebrity key
    * never serializes into one window task.
    *
    * [[asof]]'s window partitions by the key alone — at 100 TB one user
    * with millions of events is one monster sort partition. Here the
    * heavy pass partitions by (key, time-bucket): each bucket carries
    * forward locally, then a per-(key, bucket) aggregate (ONE row per
    * bucket — tiny regardless of skew) threads the carry-in value across
    * buckets with a second, cheap window, and a co-partitioned join
    * patches rows that precede their bucket's first right row. Work per
    * task is bounded by the hottest key's events per `bucket` width —
    * tune `bucket` so that is a sane partition (e.g. "1 hour" for a key
    * doing ~1M events/day). Three exchanges instead of one, each
    * skew-safe; equality with [[asof]] is pinned across bucket widths
    * on a hot-key fixture by ExtensionsSpec and by the q_asof_bucketed
    * oracle (same DuckDB ASOF JOIN as q_asof). */
  def asofBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      bucket: String = "1 day"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val rvType = StructType(valueCols.map(c => right.schema(c)).toArray)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    // bucket id by integer arithmetic, NOT the window() function: the
    // TimeWindowing analyzer rule injects an isnotnull(time) filter, so
    // window() would silently DROP null-timestamp rows that asof keeps
    // (they sort first in its null-first ordering). um − pmod(um, w) is
    // exact floor alignment on the epoch-microsecond line and maps a
    // null timestamp to a null bucket, which sorts first in the carry
    // window — the same position asof gives those rows.
    val widthUs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(bucket))
      require(iv.months == 0,
        s"asofBucketed bucket must be a fixed-width day/time interval: $bucket")
      iv.days * 86400000000L + iv.microseconds
    }
    val um = unix_micros(col("__t"))
    val u = r.unionByName(l)
      .withColumn("__b", um - pmod(um, lit(widthUs)))
    // pass 1: carry-forward WITHIN each (key, bucket) — the only pass
    // that touches every row, partitioned so hot keys split by time
    val wLocal = Window.partitionBy(keyCols.map(col) :+ col("__b"): _*)
      .orderBy(col("__t"), col("__side"), col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__last",
      last(col("__rv"), ignoreNulls = true).over(wLocal))
    // pass 2: one row per (key, bucket) — the bucket's FINAL carried
    // value — then thread carry-ins across buckets per key. Computed
    // directly on the union (NOT on `local`: Catalyst does not reuse the
    // window subplan across branches, so deriving finals from it would
    // run the heavy (key, bucket) sort twice — plan-audited). The
    // bucket-final value is the greatest-(t, side, rv) RIGHT row: left
    // rows carry a null ordering struct, which max_by ignores, and
    // left-only buckets still group (null __bfinal threads through the
    // ignoreNulls carry window). Partial aggregation shrinks this to one
    // row per (key, bucket) per map task before its shuffle — narrow and
    // skew-immune regardless of the hot key.
    val finals = u
      .groupBy(keyCols.map(col) :+ col("__b"): _*)
      .agg(max_by(col("__rv"), when(col("__rv").isNotNull,
        struct(col("__t"), col("__side"), col("__rv")))).as("__bfinal"))
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = finals.withColumn("__carry",
      last(col("__bfinal"), ignoreNulls = true).over(wCarry))
      .select(keyCols.map(col) :+ col("__b") :+ col("__carry"): _*)
    // pass 3: co-partitioned join (key, bucket) patches rows whose
    // bucket-local carry is null with the previous buckets' final value.
    // NULL-SAFE keys: asof's window treats a null key (or the null
    // bucket of a null timestamp) as its own group, so the patch join
    // must match them too — a plain equi-join would silently DROP every
    // null-key left row and diverge from asof
    val carryK = carry.select(
      keyCols.map(c => col(c).as(s"__ck_$c")) ++
        Seq(col("__b").as("__cb"), col("__carry")): _*)
    val patchCond = (keyCols.map(c => col(c) <=> col(s"__ck_$c")) :+
      (col("__b") <=> col("__cb"))).reduce(_ && _)
    local.join(carryK, patchCond)
      .where(col("__side") === 1)
      .withColumn("__eff", coalesce(col("__last"), col("__carry")))
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => col("__eff").getField(c).as(c)): _*)
  }
}
