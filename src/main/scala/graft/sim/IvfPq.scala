package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Similarity

/** IVF-PQ — the canonical web-scale ANN index (Jégou et al. 2011 §V:
  * "inverted file with asymmetric distance computation", the structure
  * FAISS popularized as IVFPQ): a coarse quantizer routes each vector to
  * a cell, and product quantization encodes the RESIDUAL (vector minus
  * cell centroid) into `m` code bytes. Search probes the `nprobe` best
  * cells and scores candidates as
  *   dot(q, x) ≈ dot(q, c_cell) + Σ_mi LUT[mi][code_mi]
  * — the centroid term once per (probe, cell), the residual term from
  * the per-probe lookup table — then exact-re-ranks the shortlist.
  *
  * Why this is the 100 TB shape: the cell equi-join prunes the scan to
  * nprobe/nlist of the corpus (IVF), the scanned bytes per candidate are
  * `m` codes + a norm instead of the raw vector (PQ), and raw vectors
  * are fetched only for the shortlist. All three stages are the same
  * join/projection shapes as [[IvfCosine]] and [[PqCosine]].
  *
  * Numeric contract for the oracle: residual dot products are computed
  * as the DIFFERENCE OF TWO DOTS, `s·c − c_cell_s·c` (never materializing
  * the residual vector), and the ADC sum is the explicit left-associated
  * chain `qc + t₀ + … + t₇` — the DuckDB SQL mirrors both forms, so the
  * full index — assignment, residual encoding, probe routing, ADC,
  * re-rank — verifies bit-for-bit against pinned centroid/codebook
  * grids. North-star extension beyond the reference (SURVEY.md §7.6).
  */
object IvfPq {

  /** Residual-PQ encoding against fixed coarse centroids + codebooks.
    * Output: (idCol, cell, codes array<int>, nrm). The per-subspace
    * comparator drops the constant `r·r` term: argmin_k of
    * `cc_k − 2·(s·c_k − c_cell_s·c_k)`, where the `c_cell_s·c_k`
    * corrections are 3-D literals indexed by the runtime cell id. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val subDim = codebooks(0)(0).length
    val assigned = IvfCosine
      .assignByCentroids(corpus, idCol, vecCol, coarse).assigned
    val codeCols: Seq[Column] = codebooks.toIndexedSeq.zipWithIndex.map {
      case (book, mi) =>
        val sub = slice(col(vecCol), mi * subDim + 1, subDim)
        val cands = book.zipWithIndex.map { case (ck, ki) =>
          val cc = ck.map(x => x * x).sum
          // corr(cell) = c_cell subvector · ck, one literal per cell
          val corr = coarse.map { cent =>
            val cs = cent.slice(mi * subDim, (mi + 1) * subDim)
            cs.zip(ck).map { case (a, b) => a * b }.sum
          }
          val rDot = Similarity.dot(sub, typedlit(ck)) -
            element_at(typedlit(corr), col("cell") + 1)
          struct((lit(cc) - lit(2.0) * rDot).as("d"), lit(ki).as("code"))
        }
        array_min(array(cands.toIndexedSeq: _*)).getField("code")
    }
    assigned.select(col(idCol), col("cell"),
      array(codeCols: _*).as("codes"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("nrm"))
  }

  /** Probe the `nprobe` cells closest by centroid cosine (same routing
    * as [[IvfCosine.search]]), ADC-score in-cell candidates, keep the
    * `shortlist` best per probe, exact-re-rank to the top `k`. */
  def search(codes: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    val m = codebooks.length
    val nk = codebooks(0).length
    val subDim = codebooks(0)(0).length
    val cents = typedlit(coarse)
    val lutTerms: Seq[Column] = for {
      mi <- 0 until m; ki <- 0 until nk
    } yield Similarity.dot(slice(col(qvecCol), mi * subDim + 1, subDim),
      typedlit(codebooks(mi)(ki)))
    val qn = sqrt(Similarity.dot(col(qvecCol), col(qvecCol)))
    // routing: top-nprobe cells by centroid cosine (ties to low cell id),
    // carrying the raw dot(q, c_cell) the ADC score needs
    val probeCells = probes
      .select(col(qidCol), col(qvecCol), qn.as("__qn"),
        array(lutTerms: _*).as("__lut"),
        posexplode(cents).as(Seq("__c0", "cvec")))
      .withColumn("__qc", Similarity.dot(col(qvecCol), col("cvec")))
      .withColumn("__csim", col("__qc")
        / (col("__qn") * sqrt(Similarity.dot(col("cvec"), col("cvec")))))
      .withColumn("__crank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("__csim").desc, col("__c0"))))
      .where(col("__crank") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("__qn"), col("__lut"),
        col("__qc"), col("__c0").as("cell"))
    val adc = (0 until m).map(mi =>
      element_at(col("__lut"),
        element_at(col("codes"), mi + 1) + lit(mi * nk) + 1))
      .foldLeft(col("__qc"))(_ + _)
    val short = codes.join(probeCells, Seq("cell"))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(qvecCol), col("__qn"), col(idCol),
        (adc / (col("__qn") * col("nrm"))).as("approx_cos"))
      .withColumn("__arank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("approx_cos").desc, col(idCol))))
      .where(col("__arank") <= shortlist)
    short
      .join(corpus.select(col(idCol), col(vecCol),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__cn")),
        Seq(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("nid"),
        (Similarity.dot(col(qvecCol), col(vecCol))
          / (col("__qn") * col("__cn"))).as("cosine"),
        col("approx_cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("nid"))))
      .where(col("rank") <= k)
  }
}
