package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.IvfCosine

/** Phase-level wall timing of the q_index_maint composition — the
  * instrument behind the r14 applyChanges overhead analysis (the
  * sidecar + epoch protocol added fixed per-run jobs; this names
  * which). Run: tools/run.sh graft.tools.MaintProbe <sfDir>. */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val DIM = 64
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // GRAFT_PROBE_NLIST: probe the corpus-scaled grid (bounded-cell
    // lifecycle config) instead of the fixed 16-cell gate grid
    val nlistEnv = sys.env.get("GRAFT_PROBE_NLIST").map(_.toInt)
    val oldSnap = all.where(col("vec_id") % 5 =!= 0)
    val newSnap = all.where(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"),
        when(col("vec_id") % 11 === 0,
          transform(col("embedding"), x => x * lit(0.5f)))
          .otherwise(col("embedding")).as("embedding"))
    val path = java.nio.file.Files.createTempDirectory("graft-mprobe")
      .resolve("idx").toString
    // warmup
    all.limit(100).agg(sum(size(col("embedding")))).collect()
    val nlist = nlistEnv.getOrElse(16)
    val grid = IvfCosine.pinnedCentroids(nlist, DIM)
    val cents = IvfCosine.centroidsDf(spark, grid)
    println(s"nlist = $nlist")
    val assignedBase = t("assign (data form)") {
      IvfCosine.assignByCentroidsDf(oldSnap, "vec_id", "embedding",
        cents).select(col("vec_id"), col("embedding"), col("cell"))
        .localCheckpoint()
    }
    t("saveIndex") {
      IvfCosine.saveIndex(path, IvfCosine.Index(grid, assignedBase),
        "vec_id", "embedding")
    }
    val d = t("diff") {
      graft.sources.SnapshotDiff.diff(oldSnap, newSnap, "vec_id",
        md5(to_json(struct(col("embedding"))))).localCheckpoint()
    }
    val added = newSnap.join(d.where(col("status") === "added")
      .select("vec_id"), Seq("vec_id"))
    val changed = newSnap.join(d.where(col("status") === "changed")
      .select("vec_id"), Seq("vec_id"))
    val removed = d.where(col("status") === "removed").select("vec_id")
    t("appendToIndex") { IvfCosine.appendToIndex(path, added) }
    t("applyChanges") {
      IvfCosine.applyChanges(spark, path, changed, removed)
    }
    val idx = t("loadIndex") {
      IvfCosine.loadIndex(spark, path, "vec_id", "embedding")
    }
    val probes = newSnap.where(col("vec_id") % 29 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    t("search") {
      IvfCosine.searchDf(idx.assigned, probes, "vec_id", "embedding",
        "qid", "qvec", IvfCosine.centroidsDf(spark, idx.centroids),
        k = 5, nprobe = 4, dim = DIM)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
