package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BucketedLayout, SnapshotDiff}

/** Round-9 ingest-maintenance operators: snapshot CDC classification,
  * bucketed-layout composition (diff with zero exchanges), small-files
  * compaction contracts, and the count-min sketch guarantee. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot diff classifies all four statuses on a pinned fixture") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newS = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = SnapshotDiff.diff(oldS, newS, "doc_id", md5(col("text")))
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff over BUCKETED snapshots plans with zero exchanges — the " +
    "two layouts compose (the shuffle was paid at write time)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    BucketedLayout.writeBucketed(d, "doc_id", 8, "graft_snap_old",
      BucketedLayout.scratchDir("snap_old"))
    BucketedLayout.writeBucketed(d.where(col("doc_id") % 7 =!= 0),
      "doc_id", 8, "graft_snap_new",
      BucketedLayout.scratchDir("snap_new"))
    val diff = SnapshotDiff.diff(spark.table("graft_snap_old"),
      spark.table("graft_snap_new"), "doc_id", md5(col("text")))
    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed diff shuffles:\n$plan")
    val byStatus = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("removed", 0L) > 0
      && byStatus.getOrElse("changed", 0L) == 0
      && byStatus.getOrElse("added", 0L) == 0)
  }

  test("compaction: ceil(rows/target) range-partitioned files, disjoint " +
    "key ranges, content layout-invariant") {
    val src = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars")
    val small = BucketedLayout.scratchDir("spec_small")
    val outP = BucketedLayout.scratchDir("spec_compact")
    src.repartition(64).write.mode("overwrite").parquet(small)
    assert(spark.read.parquet(small)
      .select(input_file_name()).distinct().count() >= 32,
      "small-files precondition lost")
    val n = src.count()
    val compacted = BucketedLayout.compact(
      spark.read.parquet(small), "doc_id", 250L, outP)
    val expectFiles = ((n + 249) / 250).toInt
    val perFile = compacted
      .groupBy(input_file_name().as("f"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perFile.length == expectFiles,
      s"expected $expectFiles files, got ${perFile.length}")
    assert(perFile.map(_._3).sum == n)
    // ranges disjoint and ordered (range partitioning on the sort key)
    perFile.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // content is exactly the source regardless of layout
    assert(compacted.exceptAll(src).isEmpty && src.exceptAll(compacted).isEmpty)
  }

  test("count-min: estimate >= exact everywhere on the corpus; exact " +
    "when the width comfortably exceeds the vocabulary") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val est = graft.text.CountMin.estimate(docs, "text",
      depth = 4, width = 64).collect()
    assert(est.nonEmpty)
    assert(est.forall(_.getBoolean(3)), "CMS must never underestimate")
    // wide sketch: few-token vocabulary, collisions vanish at min-depth
    val wide = graft.text.CountMin.estimate(docs, "text",
      depth = 4, width = 4096)
    assert(wide.where(col("cms_est") =!= col("n_exact")).count() == 0,
      "width 4096 over a tiny vocabulary should be collision-free at " +
        "the min over 4 rows")
    // the sketch frame itself is bounded by depth x width
    assert(graft.text.CountMin.sketch(docs, "text", 4, 64).count() <=
      4L * 64)
  }
}

/** Merge-on-read CDC resolve (SnapshotDiff.resolveLatest): version
  * precedence, tombstones, deterministic tie resolution, and the
  * map-side-combined plan shape. */
class CdcResolveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.sources.SnapshotDiff

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
    .toDF("doc_id", "text")

  test("latest version wins, tombstones delete, additions appear, base " +
    "rows without deltas survive at version 0") {
    val deltas = Seq(
      (2L, "b2", 1L, "U"), (2L, "b3", 2L, "U"),
      (3L, "", 1L, "D"),
      (4L, "d", 1L, "U")
    ).toDF("doc_id", "text", "version", "op")
    val out = SnapshotDiff.resolveLatest(base.where(col("doc_id") =!= 5),
      deltas, "doc_id", "version", "op")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out == Map(1L -> ((0L, "a")), 2L -> ((2L, "b3")),
      4L -> ((1L, "d"))))
  }

  test("same-version edit/delete collision resolves deterministically " +
    "(op 'U' > 'D' in the struct max) — reproducible, not undefined") {
    val deltas = Seq((5L, "e2", 1L, "U"), (5L, "", 1L, "D"))
      .toDF("doc_id", "text", "version", "op")
    val out = SnapshotDiff.resolveLatest(
      base.where(col("doc_id") === 5), deltas, "doc_id", "version", "op")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out == Map(5L -> ((1L, "e2"))))
  }

  test("delete-vs-upsert tie precedence is independent of op spelling: " +
    "a deleteOp sorting ABOVE the upsert op ('X' > 'U') still loses " +
    "the same-version collision to the upsert") {
    val deltas = Seq((5L, "e2", 1L, "U"), (5L, "", 1L, "X"))
      .toDF("doc_id", "text", "version", "op")
    val out = SnapshotDiff.resolveLatest(
      base.where(col("doc_id") === 5), deltas, "doc_id", "version", "op",
      deleteOp = "X")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out == Map(5L -> ((1L, "e2"))),
      "upsert must win the tie regardless of the delete op's sort order")
    // and a LATER delete still tombstones, spelling notwithstanding
    val out2 = SnapshotDiff.resolveLatest(
      base.where(col("doc_id") === 5),
      Seq((5L, "e2", 1L, "U"), (5L, "", 2L, "X"))
        .toDF("doc_id", "text", "version", "op"),
      "doc_id", "version", "op", deleteOp = "X")
    assert(out2.count() == 0, "higher-version delete tombstones the id")
  }

  test("resolve is ONE map-side-combined aggregate: partial_max before " +
    "the exchange, no window, one exchange") {
    val deltas = Seq((2L, "b2", 1L, "U")).toDF("doc_id", "text",
      "version", "op")
    val df = SnapshotDiff.resolveLatest(base, deltas, "doc_id",
      "version", "op")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"versions must collapse map-side:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"one exchange expected:\n$plan")
  }
}

/** The composed daily incremental-ingest pipeline (q_ingest_pipeline):
  * CDC diff -> delta blocklist screen -> merge-on-read resolve. */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("semantic milestones: removals tombstone, blocked changed docs " +
    "keep their last good version, clean deltas upsert at v1") {
    val sf = "/root/testdata/sf0.001"
    val out = QueriesText.queries("q_ingest_pipeline")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every removed id (doc_id % 17 == 3, not re-added) is gone
    assert(base.filter(id => id % 17 == 3).forall(!out.contains(_)))
    // added ids appear at version 1
    val addedIds = base.filter(_ % 19 == 5).map(_ + 1000000L)
    // (added docs can themselves be blocklisted; those never appear)
    assert(addedIds.filter(out.contains).forall(out(_) == 1L))
    // changed ids are split: upserted ones at v1, blocked ones at v0 —
    // and BOTH classes occur on this corpus (the screen has real work)
    val changed = base.filter(id => id % 13 == 2 && id % 17 != 3)
    val versions = changed.map(out(_)).toSet
    assert(versions == Set(0L, 1L),
      s"expected both blocked (v0) and clean (v1) changed docs: $versions")
    // untouched docs stay at version 0
    assert(base.filter(id =>
      id % 13 != 2 && id % 17 != 3).forall(out(_) == 0L))
  }
}

/** The MOR companions' composed contract (SnapshotDiff.resolveLatest +
  * BucketedLayout.compact): compaction FOLDS the delta log — resolving,
  * compacting, and re-reading yields the same table as resolving before
  * compaction; the post-compaction read plans as a bare scan (no
  * delta-log union); and a folded base continues the log correctly. */
class MorCompactionFoldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.DataFrame

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    .toDF("doc_id", "text")
  private val deltas = Seq(
    (2L, "b2", 1L, "U"), (2L, "b3", 2L, "U"),
    (3L, "", 1L, "D"),
    (5L, "e", 1L, "U")
  ).toDF("doc_id", "text", "version", "op")

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("resolve -> compact -> re-read == resolve-before-compact; the " +
    "compacted read has no delta-log union in its plan") {
    val resolved = SnapshotDiff.resolveLatest(base, deltas,
      "doc_id", "version", "op")
    // precondition: the merge-on-read plan genuinely carries the union
    assert(resolved.queryExecution.executedPlan.toString.contains("Union"),
      "MOR resolve should union base + log — else the fold is vacuous")
    val before = rows(resolved)
    val compacted = BucketedLayout.compact(
      resolved.select("doc_id", "text"), "doc_id", 2L,
      BucketedLayout.scratchDir("mor_fold"))
    assert(rows(compacted) == before, "compaction changed the table")
    val plan = compacted.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"post-compaction read must be a bare scan, no log union:\n$plan")
  }

  test("a folded base continues the log: resolve(compactedBase, " +
    "laterDeltas) == resolve(base, deltas ++ laterDeltas)") {
    val later = Seq((1L, "a9", 3L, "U"), (5L, "", 3L, "D"))
      .toDF("doc_id", "text", "version", "op")
    val folded = BucketedLayout.compact(
      SnapshotDiff.resolveLatest(base, deltas, "doc_id", "version", "op")
        .select("doc_id", "text"),
      "doc_id", 2L, BucketedLayout.scratchDir("mor_fold2"))
    val viaFold = SnapshotDiff.resolveLatest(folded, later,
      "doc_id", "version", "op")
    val viaLog = SnapshotDiff.resolveLatest(base,
      deltas.unionByName(later), "doc_id", "version", "op")
    assert(rows(viaFold) == rows(viaLog),
      "folding the log must not change the resolved table")
    assert(rows(viaFold) == Set((1L, "a9"), (2L, "b3"), (4L, "d")))
  }
}
