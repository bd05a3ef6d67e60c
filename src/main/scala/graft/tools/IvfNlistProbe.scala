package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE_r12 probe (dev aid, not a driver contract): q_umap_ivf pins
  * nlist=16 for oracle reproducibility, which makes its all-corpus
  * self-kNN edge build N²·(nprobe/nlist) — quadratic once N outgrows
  * the fixed cell count (the sf1 checkpoint measured 15.5x at 10x
  * data). The OPERATOR is not quadratic: cells are meant to stay
  * bounded, nlist ∝ N. This main times the same UMAP fit at a given sf
  * dir for a list of nlist values, demonstrating the bounded-cell
  * configuration restores the near-linear curve. */
object IvfNlistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.sf1_testdata")
    val nlists = if (args.length > 1) args.tail.map(_.toInt).toSeq
      else Seq(16, 64, 160)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    println(s"corpus rows: ${e.count()}")
    for (nlist <- nlists) {
      val t0 = System.nanoTime()
      graft.ml.UmapAnalog.fitTransform(e,
        graft.ml.UmapAnalog.ivfKnnEdges(e, "vec_id", "embedding",
          dim = 64, k = 5, nlist = nlist, nprobe = 4),
        "vec_id", "embedding", dim = 64,
        negOffsets = Seq(17L, 131L, 313L), iters = 3, lr = 0.05,
        gamma = 1.0, eps = 1e-3)
        .write.format("noop").mode("overwrite").save()
      println(f"nlist=$nlist%4d  fit: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
