package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Similarity

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nlist` cells; each probe only
  * scans its `nprobe` closest cells. The scale path when the probe set is
  * too large to broadcast against the full corpus: the expensive join is
  * an EQUI-join on the cell id, so corpus and probes shuffle once on
  * cell — work drops from |corpus|×|probes| to ~(nprobe/nlist) of that.
  *
  * Training the quantizer samples the corpus (k-means on a bounded
  * sample — the centroid table is tiny and broadcasts).
  */
object IvfCosine {

  case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the coarse quantizer and assign every corpus row to its cell. */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L, sampleFraction: Double = 1.0): Index = {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = corpus.select(col(idCol), col(vecCol))
      .withColumn("__v", toVec(col(vecCol)))
    val trainSet = if (sampleFraction < 1.0)
      vecs.sample(sampleFraction, seed) else vecs
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("__v")
      .setPredictionCol("__cell")
    val model = km.fit(trainSet)
    val assigned = model.transform(vecs)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Top-k cosine neighbors per probe, scanning only the nprobe closest
    * cells of each probe. Probes carry (qidCol, qvecCol). */
  def search(index: Index, probes: DataFrame, idCol: String, vecCol: String,
      qidCol: String, qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = probes.sparkSession
    val cents = index.centroids.zipWithIndex
    // rank cells per probe by centroid cosine — centroid table is tiny,
    // computed as a literal-array expression (no join)
    val centArr = cents.map { case (c, i) =>
      struct(lit(i).as("cell"), array(c.map(lit): _*).as("cvec"))
    }
    val probeCells = probes.select(col(qidCol), col(qvecCol),
      explode(array(centArr: _*)).as("c"))
      .withColumn("__csim", Similarity.cosine(col(qvecCol), col("c.cvec")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("__csim").desc, col("c.cell"))))
      .where(col("__crank") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("c.cell").as("cell"))
    probeCells.join(index.assigned, Seq("cell"))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("nid"),
        Similarity.cosine(col(qvecCol), col(vecCol)).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("nid"))))
      .where(col("rank") <= k)
  }
}
