package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.IvfCosine

/** The per-cell commit-epoch protocol + id→cell sidecar (ADVICE r13 /
  * VERDICT r13 item 1): a half-applied applyChanges is detected at
  * load even when the change set is row-count NEUTRAL (the case the
  * global row count cannot see), and the old-cell lookup for a
  * day-sized change set is bucket-pruned over the sidecar — never an
  * index-proportional scan. */
class CommitEpochSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private def vecs(ids: Range, seed: Int): DataFrame = {
    val r = new scala.util.Random(seed)
    ids.map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }
  private val grid = IvfCosine.pinnedCentroids(4, dim)

  private def freshIndex(n: Int, seed: Int): (String, DataFrame) = {
    val base = vecs(0 until n, seed).cache()
    val p = java.nio.file.Files.createTempDirectory("graft-epoch")
      .resolve("idx").toString
    IvfCosine.saveIndex(p,
      IvfCosine.assignByCentroids(base, "vec_id", "embedding", grid),
      "vec_id", "embedding")
    (p, base)
  }

  test("a ROW-COUNT-NEUTRAL half-applied rewrite is refused at load: " +
    "a rewritten cell whose marker outruns the recorded epoch (crash " +
    "before the meta republish) and a missing marker both fail, with " +
    "the cell named") {
    val (p, _) = freshIndex(60, 11)
    // loads clean first
    IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    // simulate the crash ADVICE r13 names: applyChanges rewrote cell 0
    // (dynamic overwrite destroyed its _epoch_1 marker, the rewrite
    // re-marked it at epoch 2) and died before centroids.json
    // republished — same row count, stale meta
    val dir = new org.apache.hadoop.fs.Path(s"$p/assigned/cell=0")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_epoch_1"), false)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_epoch_2")).close()
    val e = intercept[IllegalArgumentException] {
      IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("cell=0") &&
      e.getMessage.contains("_epoch_1"),
      s"error must name the stale cell and epoch: ${e.getMessage}")
    // a marker missing entirely (crash mid-overwrite) also fails
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_epoch_2"), false)
    intercept[IllegalArgumentException] {
      IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    }
  }

  test("a vanished cell directory (crash mid emptied-cell deletion) " +
    "is refused at load even when only the dir set changed") {
    val (p, _) = freshIndex(60, 13)
    val dir = new org.apache.hadoop.fs.Path(s"$p/assigned/cell=1")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(dir))
    fs.delete(dir, true)
    val e = intercept[IllegalArgumentException] {
      IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("did not commit completely"),
      e.getMessage)
  }

  test("pure re-embeds that KEEP their cells (the row-count-neutral " +
    "maintenance) commit cleanly end-to-end: load passes, the epoch " +
    "map advanced for exactly the affected cells, search equals a " +
    "rebuild") {
    val (p, base) = freshIndex(80, 17)
    val assigned =
      IvfCosine.assignByCentroids(base, "vec_id", "embedding", grid)
        .assigned.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // upsert 3 ids with a COPY of a same-cell donor's vector — the new
    // vector re-assigns into the same cell deterministically, so the
    // change is row-count neutral AND cell-set neutral
    val byCell = assigned.groupBy(_._2).map { case (c, xs) =>
      c -> xs.keys.toSeq.sorted }
    val (cell, members) = byCell.maxBy(_._2.size)
    val donorVec = base.where(col("vec_id") === members.head)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val changeIds = members.tail.take(3)
    val upserts = changeIds.map(id => (id, donorVec))
      .toDF("vec_id", "embedding")
    IvfCosine.applyChanges(spark, p, upserts,
      Seq.empty[Long].toDF("vec_id"))
    val loaded = IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    assert(loaded.assigned.count() == 80)
    // the affected cell's marker moved to epoch 2; the others kept 1
    val hconf = spark.sparkContext.hadoopConfiguration
    def marker(c: Int, e: Long) = {
      val f = new org.apache.hadoop.fs.Path(
        s"$p/assigned/cell=$c/_epoch_$e")
      f.getFileSystem(hconf).exists(f)
    }
    assert(marker(cell, 2L), "rewritten cell must carry _epoch_2")
    byCell.keys.filter(_ != cell).foreach(c =>
      assert(marker(c, 1L), s"untouched cell=$c must keep _epoch_1"))
    // values: maintained == rebuild over today's content
    val todays = base.where(!col("vec_id").isin(changeIds: _*))
      .unionByName(upserts)
    val rebuilt =
      IvfCosine.assignByCentroids(todays, "vec_id", "embedding", grid)
    val probes = todays.where(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def res(ix: IvfCosine.Index) = IvfCosine.search(ix, probes,
      "vec_id", "embedding", "qid", "qvec", k = 3, nprobe = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        r.getInt(3))).toSet
    assert(res(loaded) == res(rebuilt))
  }

  test("sidecar old-cell lookup: values equal the assigned-tree scan, " +
    "and the PLAN is bucket-pruned over idmap — PartitionFilters on " +
    "bucket, no read of the assigned tree") {
    val (p, base) = freshIndex(100, 19)
    val affected = base.where(col("vec_id") % 9 === 0)
      .select(col("vec_id")).localCheckpoint()
    // bucket count as recorded at save time (adaptive default) — the
    // lookup must use the artifact's own bucketing, like applyChanges
    val recordedBuckets =
      graft.ml.WeightsIO.load(s"$p/centroids.json")._1("buckets").toInt
    val viaSidecar = IvfCosine.sidecarOldCells(spark, p, affected,
      "vec_id", buckets = recordedBuckets)
    val viaScan = spark.read.parquet(s"$p/assigned")
      .join(broadcast(affected), Seq("vec_id"))
      .select(col("vec_id"), col("cell"))
    assert(viaSidecar.exceptAll(viaScan).isEmpty &&
      viaScan.exceptAll(viaSidecar).isEmpty,
      "sidecar lookup must return the identical (id, cell) set")
    val plan = viaSidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan)
      .nonEmpty, s"lookup must prune idmap buckets at plan time:\n$plan")
    assert(plan.contains("idmap") && !plan.contains("assigned"),
      "lookup must read ONLY the sidecar, never the assigned tree")
  }

  test("appendToIndex keeps the sidecar and epoch map in sync: new " +
    "cells get markers at the bumped epoch, load verifies sidecar " +
    "rows, and the sidecar lookup sees appended ids") {
    val base = vecs(0 until 50, 23).cache()
    val p = java.nio.file.Files.createTempDirectory("graft-epoch")
      .resolve("idx").toString
    // build over HALF the cells' worth of data so the append can
    // plausibly create new cells; with the pinned grid we just check
    // consistency rather than force creation
    IvfCosine.saveIndex(p,
      IvfCosine.assignByCentroids(base, "vec_id", "embedding", grid),
      "vec_id", "embedding")
    val delta = vecs(50 until 80, 29)
    IvfCosine.appendToIndex(p, delta)
    val idx = IvfCosine.loadIndex(spark, p, "vec_id", "embedding")
    assert(idx.assigned.count() == 80)
    val side = spark.read.parquet(s"$p/idmap")
    assert(side.count() == 80, "sidecar must hold every appended id")
    // sidecar rows agree with the assigned tree row for row
    val fromAssigned = idx.assigned.select("vec_id", "cell")
    assert(side.select("vec_id", "cell").exceptAll(fromAssigned).isEmpty
      && fromAssigned.exceptAll(side.select("vec_id", "cell")).isEmpty)
  }
}
