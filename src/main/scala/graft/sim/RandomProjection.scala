package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, Similarity}

/** Johnson–Lindenstrauss random projection for embedding columns
  * (Achlioptas 2003, "Database-friendly random projections", JCSS —
  * the ±1 variant: entries drawn uniformly from {+1/√k, −1/√k} preserve
  * pairwise distances within (1±ε) with the same guarantees as
  * Gaussian matrices, public literature). The standard cheap
  * dimensionality-reduction step ahead of ANN indexing or clustering:
  * dim 64 → 16 cuts every downstream dot product and byte count 4×
  * while approximately preserving geometry.
  *
  * The projection matrix is md5-DERIVED (same deterministic hash
  * family as the SRP hyperplanes, [[Dedup.srpWeight]]'s pattern) — no
  * stored model, reproducible across engines, so the whole operator is
  * a pure codegen projection under a bit-exact DuckDB oracle. The
  * matrix is outDim×inDim structural constants (bounded like a column
  * list — never a scale axis), carried as one row-per-output literal
  * through the shared VecDot kernel; nothing shuffles.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object RandomProjection {

  /** ±1/√outDim entry for (row, col), md5-derived ("jl:" seed domain —
    * disjoint from the SRP planes). */
  def weight(outDim: Int)(row: Int, c: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"jl:$row:$c".getBytes("UTF-8"))
    val s = if ((h(0) & 1) == 0) 1.0 else -1.0
    s / math.sqrt(outDim.toDouble)
  }

  def matrix(outDim: Int, inDim: Int): Array[Array[Double]] =
    Array.tabulate(outDim, inDim)(weight(outDim))

  /** (idCol, projected array<double> of length outDim): y_r = w_r · v
    * through the VecDot kernel — index-ascending accumulation, the
    * IEEE order the SQL mirror writes explicitly. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, inDim: Int): DataFrame = {
    val m = matrix(outDim, inDim)
    df.select(col(idCol),
      array(m.toIndexedSeq.map(row =>
        Similarity.dot(col(vecCol), typedlit(row))): _*).as("projected"))
  }

  /** DuckDB mirror of one output coordinate `r` over a DOUBLE[]
    * expression `e`: the explicit left-associated weighted chain. */
  def projectSql(e: String, outDim: Int, inDim: Int, r: Int): String =
    (0 until inDim).map(c =>
      s"$e[${c + 1}] * ${weight(outDim)(r, c)}").mkString(" + ")
}
