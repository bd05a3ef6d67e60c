package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.ml.UmapAnalog]] kNN seam: the attraction graph arrives
  * through the `knnEdges` parameter, so the corpus-scale producer
  * ([[graft.ml.UmapAnalog.ivfKnnEdges]] — cell-partitioned equi-join,
  * no whole-corpus broadcast) can replace the test-scale brute-force
  * build WITHOUT changing the result. Two pins:
  *   1. IVF edges at nprobe == nlist (full probe — every cell scanned)
  *      are set-identical to brute-force edges: the candidate set is the
  *      whole corpus on both paths and the (cosine desc, nid) ranking
  *      key is shared, so equality holds by construction — this spec
  *      keeps it that way.
  *   2. fitTransform through the edge seam with those IVF edges is
  *      bit-identical to the hard-wired brute path, i.e. the scale swap
  *      is result-invisible.
  */
class UmapKnnSeamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8
  private def corpus(n: Int): DataFrame = spark.range(n)
    .select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dim), " +
        "j -> CAST(sin((id + 1) * j) AS FLOAT))").as("embedding"))

  test("ivfKnnEdges at full probe (nprobe == nlist) is set-identical " +
    "to bruteKnnEdges — the scale producer honors the same contract") {
    val df = corpus(80)
    val brute = graft.ml.UmapAnalog
      .bruteKnnEdges(df, "vec_id", "embedding", dim, k = 5)
    val ivf = graft.ml.UmapAnalog
      .ivfKnnEdges(df, "vec_id", "embedding", dim, k = 5,
        nlist = 4, nprobe = 4)
    val (bs, is) = (brute.collect().map(_.toSeq).toSet,
      ivf.collect().map(_.toSeq).toSet)
    assert(bs.size == 80 * 5, "k edges per node")
    assert(bs == is,
      "full-probe IVF edges must equal brute-force edges")
  }

  test("fitTransform through the edge seam with IVF edges is " +
    "bit-identical to the brute-force default — the swap is " +
    "result-invisible") {
    val df = corpus(60)
    val viaBrute = graft.ml.UmapAnalog.fitTransform(df, "vec_id",
      "embedding", dim, k = 5, iters = 2)
    val ivfEdges = graft.ml.UmapAnalog
      .ivfKnnEdges(df, "vec_id", "embedding", dim, k = 5,
        nlist = 4, nprobe = 4)
    val viaSeam = graft.ml.UmapAnalog.fitTransform(df, ivfEdges,
      "vec_id", "embedding", dim,
      negOffsets = Seq(17L, 131L, 313L), iters = 2,
      lr = 0.05, gamma = 1.0, eps = 1e-3)
    assert(viaBrute.collect().map(_.toSeq).toSet ==
      viaSeam.collect().map(_.toSeq).toSet,
      "edge-seam fit with full-probe IVF edges must match the default")
  }
}
