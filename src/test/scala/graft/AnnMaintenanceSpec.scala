package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.IvfCosine
import graft.sources.SnapshotDiff

/** Incremental ANN-index maintenance — the composition SnapshotDiff's
  * doc promises ("`added ∪ changed` is exactly the delta batch ... the
  * ANN index updaters take"): only the DELTA is re-assigned against the
  * (fixed) coarse quantizer, the index table is maintained merge-on-read
  * via resolveLatest, and the maintained index is row-identical to a
  * full batch rebuild — so searches over it are too. The re-assignment
  * job is delta-proportional by construction (assignByCentroidsDf runs
  * on the delta frame alone; the corpus at rest is never re-scored). */
class AnnMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val DIM = 64
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val cents =
    IvfCosine.centroidsDf(spark, IvfCosine.pinnedCentroids(8, DIM))

  private def assign(df: DataFrame): DataFrame =
    IvfCosine.assignByCentroidsDf(df, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"), col("cell"))

  test("delta-only re-assignment + MOR resolve == full index rebuild; " +
    "IVF search over the maintained index matches the rebuilt one") {
    import spark.implicits._
    // yesterday's corpus: ids not divisible by 11
    val base = emb.where(col("vec_id") % 11 =!= 0)
    val baseIdx = assign(base)
    // today's delta: additions (the % 11 ids), re-embedded docs (the
    // % 7 ids, vectors negated — content change), and a few deletes
    val added = emb.where(col("vec_id") % 11 === 0)
    val changed = base.where(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val deltaDocs = added.unionByName(changed)
    val deltaIdx = assign(deltaDocs)
      .withColumn("version", lit(1L)).withColumn("op", lit("U"))
    // deletes at version 2: a handful of the delta ids are divisible by
    // 13 too, and the retention delete must beat their same-day upsert
    val deletes = emb.where(col("vec_id") % 13 === 0)
      .select(col("vec_id"), col("embedding"),
        lit(-1).as("cell"), lit(2L).as("version"), lit("D").as("op"))
    // delta-proportional: the assignment job saw ONLY the delta rows
    assert(deltaIdx.count() == deltaDocs.count())

    val maintained = SnapshotDiff.resolveLatest(baseIdx,
      deltaIdx.unionByName(deletes), "vec_id", "version", "op")
      .select("vec_id", "embedding", "cell")

    // ground truth: rebuild the index over today's corpus content
    val todays = base
      .where(col("vec_id") % 7 =!= 0 && col("vec_id") % 13 =!= 0)
      .unionByName(deltaDocs.where(col("vec_id") % 13 =!= 0))
    val rebuilt = assign(todays)
    assert(maintained.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(maintained).isEmpty,
      "maintained index must be row-identical to a batch rebuild")

    // and the search path consumes the maintained index unchanged
    val probes = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def top(idx: DataFrame) = IvfCosine.search(
      IvfCosine.Index(IvfCosine.pinnedCentroids(8, DIM), idx), probes,
      "vec_id", "embedding", "qid", "qvec", k = 5, nprobe = 3, dim = DIM)
      .select(col("qid"), col("nid"),
        graft.functions.FastRound(col("cosine"), 6).as("c"), col("rank"))
    assert(top(maintained).exceptAll(top(rebuilt)).isEmpty,
      "search results must not see the maintenance seam")
  }
}
