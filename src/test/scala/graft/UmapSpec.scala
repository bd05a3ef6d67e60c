package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ml.UmapAnalog]]: determinism (the property the unrolled
  * q_umap_analog oracle rests on) and gradient direction — epochs
  * contract the kNN edges the objective attracts along. */
class UmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8
  private def corpus(n: Int): DataFrame = spark.range(n)
    .select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dim), " +
        "j -> CAST(sin((id + 1) * j) AS FLOAT))").as("embedding"))

  private def meanEdgeD2(df: DataFrame, pos: DataFrame): Double = {
    val probes = df.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    val edges = graft.sim.CosineTopK.bruteForce(df, probes, "vec_id",
      "embedding", "qid", "qvec", k = 5, dim = dim)
      .select(col("qid").as("src"), col("nid").as("dst"))
    edges
      .join(pos.select(col("vec_id").as("src"), col("dim_0").as("x1"),
        col("dim_1").as("y1")), Seq("src"))
      .join(pos.select(col("vec_id").as("dst"), col("dim_0").as("x2"),
        col("dim_1").as("y2")), Seq("dst"))
      .agg(avg(pow(col("x1") - col("x2"), 2.0)
        + pow(col("y1") - col("y2"), 2.0)))
      .head().getDouble(0)
  }

  test("umap analog: bit-identical across runs (the determinism the " +
    "unrolled oracle rests on); 3 epochs contract the mean kNN-edge " +
    "distance vs the JL init; output keeps the dim_{i} contract") {
    val df = corpus(80)
    val a = graft.ml.UmapAnalog.fitTransform(df, "vec_id", "embedding",
      dim, iters = 3)
    val b = graft.ml.UmapAnalog.fitTransform(df, "vec_id", "embedding",
      dim, iters = 3)
    assert(a.columns.toSeq == Seq("vec_id", "dim_0", "dim_1"))
    val (ra, rb) = (a.collect().map(_.toSeq).toSet,
      b.collect().map(_.toSeq).toSet)
    assert(ra == rb, "two fits of the same data must be bit-identical")
    assert(ra.size == 80, "one embedding per input row")
    val init = graft.ml.UmapAnalog.fitTransform(df, "vec_id", "embedding",
      dim, iters = 0)
    val (d0, d3) = (meanEdgeD2(df, init), meanEdgeD2(df, a))
    assert(d3 < d0,
      s"attraction should contract kNN edges: init $d0 -> epoch-3 $d3")
  }
}
