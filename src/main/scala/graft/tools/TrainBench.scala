package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics: time ONE epoch-gradient of each trainable
  * estimator's kernel at SPARK_GRAFT_SF_DIR scale (dev aid; not part of
  * the driver contract). Run at two SFs to check the treeAggregate /
  * batched-rank paths scale linearly in rows. */
object TrainBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(("l_extendedprice" +: feats).map(c =>
        col(c).cast("double")): _*).na.drop().cache()
    val n = li.count()
    println(s"rows=$n dir=$dir")

    def time(label: String)(body: => Unit): Unit = {
      body // warm (first-touch/codegen)
      val t0 = System.nanoTime()
      body; body; body
      println(f"$label%-14s ${(System.nanoTime() - t0) / 3e9}%.3f s/epoch")
    }

    val r = new scala.util.Random(1)
    import graft.ml._
    // MLP proxy: fit(epochs=1) = one treeAggregate epoch + fixed setup;
    // batchFraction pinned to full-batch so the row is comparable across
    // rounds regardless of the trainer default
    time("mlp") {
      new MLPRegressor(feats, "l_extendedprice", hidden = 16,
        epochs = 1, batchFraction = 1.0).fit(li)
    }
    time("deep-multi") {
      new DeepMLPMultiRegressor(feats,
        Seq("l_extendedprice", "t2"), layers = Seq(16, 16),
        epochs = 1, batchFraction = 1.0)
        .fit(li.withColumn("t2", col("l_quantity") * 0.5))
    }
    val ndf = new SoftNdfRegressor(feats, "l_extendedprice",
      numTrees = 5, depth = 3)
    val masks = Seq.fill(5)(Array(0, 1, 2))
    val p = Array.fill(3 * 7 * 5 + (7 + 8) * 5)(r.nextGaussian() * 0.3)
    val std = li.select(col("l_extendedprice") +: feats.map(col): _*)
    time("soft-ndf") { ndf.gradient(std, p, masks, 1.0) }
    val ae = new JointAutoencoder(feats, "l_extendedprice",
      latentDim = 2, encoderHidden = 8, headHidden = 4)
    val pae = Array.fill(JointAeKernel.size(3, 8, 2, 4))(
      r.nextGaussian() * 0.3)
    time("joint-ae") { ae.gradient(std, pae) }
    time("ae-rank") {
      new JointAutoencoder(feats, "l_extendedprice", latentDim = 2,
        encoderHidden = 8, headHidden = 4, targetLoss = "combined",
        rankBatch = 64).rankGradient(std, pae)
    }
    // BatchNorm trainers (round 6): one batched epoch-gradient each —
    // the per-batch BN statistics ride the SAME mapPartitions shape, so
    // these rows prove the coupling adds no superlinear term
    val bnAe = new BnJointAutoencoder(feats, "l_extendedprice",
      latentDim = 2, encoderHidden = 8, headHidden = 4)
    val pbn = Array.tabulate(BnAeKernel.size(3, 8, 2, 4)) { i =>
      if (i < JointAeKernel.size(3, 8, 2, 4)) r.nextGaussian() * 0.3
      else 1.0
    }
    time("bn-ae") { bnAe.gradient(std, pbn) }
    val dbn = new DeepBnAutoencoder(feats, "l_extendedprice",
      encoderUnits = Seq(8, 4), latentDim = 2, headUnits = Seq(4))
    val pdbn = Array.tabulate(dbn.size)(i =>
      if (i < dbn.cfg.size) r.nextGaussian() * 0.3 else 1.0)
    time("deep-bn-ae") { dbn.gradient(std, pdbn) }
    val lags = li.select(col("l_extendedprice").as("y"),
      col("l_quantity").as("lag4"), col("l_discount").as("lag3"),
      col("l_tax").as("lag2"),
      (col("l_quantity") * 0.1).as("lag1")).cache()
    lags.count()
    val lstmBn = new LSTMBnTrainer(Seq("lag4", "lag3", "lag2", "lag1"),
      seqLen = 4, targetCol = "y", hidden = 8)
    val plstm = Array.tabulate(lstmBn.size)(i =>
      if (i < lstmBn.config.size) r.nextGaussian() * 0.2 else 1.0)
    time("lstm-bn") { lstmBn.gradient(lags, plstm) }
    spark.stop()
  }
}
