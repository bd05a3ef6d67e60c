package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import graft.operators.GraftTransformer

/** Batched text-embedding map over executors.
  *
  * Re-expression of the reference's EmbeddingTransformer
  * (embedding.py:20-231): texts are embedded in batches (default 200,
  * embedding.py:39), nulls become zero vectors (embedding.py:160-178),
  * an optional template wraps the text before embedding
  * (embedding.py:147-153), output column `{col}_embedding` as
  * ArrayType(Float) (explode to `{f}_embed_{i}` columns only at the
  * sklearn-compat boundary, embedding.py:167-196).
  *
  * The embedder is a pluggable `Seq[String] => Seq[Array[Float]]` — a
  * hosted-model HTTP client in production (bounded concurrency inside the
  * partition, like the reference's async semaphore, dspymator.py:394-417),
  * a deterministic mock in tests (mirroring
  * tests/test_feature_transformers.py:102-108). Executed with
  * `mapPartitions`: one batcher instance per partition, batches of
  * `batchSize`, no shuffle.
  */
case class EmbeddingTransformer(
    textCol: String,
    embedder: Seq[String] => Seq[Array[Float]],
    batchSize: Int = 200,
    template: Option[String] = None,
    dim: Int,
    // when the embedder came from the Transports registry, its NAME —
    // the persistence seam: a pipeline artifact stores the name and
    // re-wires the function at load (PipelineIO)
    transportName: Option[String] = None) extends GraftTransformer {

  def outputNames: Seq[String] = Seq(s"${textCol}_embedding")

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(s"${textCol}_embedding", ArrayType(FloatType), true))
    val idx = df.schema.fieldIndex(textCol)
    val (bs, tmpl, emb, d) = (batchSize, template, embedder, dim)
    val out = df.rdd.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        // null-partition split (embedding.py:160-165): only non-null
        // texts reach the embedder; nulls get zero vectors
        val texts = batch.flatMap { r =>
          Option(r.get(idx)).map(v => tmpl.fold(v.toString)(t =>
            t.replace("{}", v.toString)))
        }
        val vecs = if (texts.nonEmpty) emb(texts) else Seq.empty
        // a short/long batch from the embedder would silently misalign
        // every following row — fail loudly instead
        require(vecs.size == texts.size,
          s"embedder returned ${vecs.size} vectors for ${texts.size} texts")
        var vi = 0
        batch.map { r =>
          val vec = if (r.isNullAt(idx)) Array.fill(d)(0.0f)
            else { val v = vecs(vi); vi += 1; v }
          Row.fromSeq(r.toSeq :+ vec.toSeq)
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}

object EmbeddingTransformer {
  /** Construct against a REGISTERED transport (Transports.
    * registerEmbedder) — the persistable form: PipelineIO stores the
    * transport name and re-binds the function at load, the JVM analog
    * of the reference unpickling a transformer whose dspy client is
    * re-imported by module path. */
  def named(transportName: String, textCol: String, dim: Int,
      batchSize: Int = 200, template: Option[String] = None)
      : EmbeddingTransformer =
    EmbeddingTransformer(textCol, Transports.embedder(transportName),
      batchSize, template, dim, Some(transportName))

  /** Explode `{f}_embedding` into `{f}_embed_{i}` scalar columns — the
    * reference's sklearn-boundary output contract (embedding.py:167-196). */
  def explodeToColumns(df: DataFrame, feature: String, dim: Int): DataFrame =
    df.select(col("*") +: (0 until dim).map(i =>
      element_at(col(s"${feature}_embedding"), i + 1)
        .as(s"${feature}_embed_$i")): _*)

  /** Multi-feature embedding with per-feature templates — the
    * `categorical_mapping` contract (embedding.py:55-60, :147-153):
    * features present in the mapping are rendered through their "{}"
    * template before embedding (e.g. "sector code {}"); each feature
    * contributes its own `{f}_embedding` column. */
  def forFeatures(df: DataFrame, features: Seq[String],
      embedder: Seq[String] => Seq[Array[Float]], batchSize: Int, dim: Int,
      categoricalMapping: Map[String, String] = Map.empty): DataFrame =
    features.foldLeft(df)((d, f) =>
      EmbeddingTransformer(f, embedder, batchSize,
        categoricalMapping.get(f), dim).transform(d))
}

/** Deterministic mock embedder from the reference's test suite:
  * `[len(text), Σ ord(c) mod 100]` (tests/test_feature_transformers.py:
  * 102-108) — reproducible in the DuckDB oracle for end-to-end
  * verification of the batching plumbing. */
object MockEmbedder {
  val dim = 2
  def apply(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => Array(t.length.toFloat,
      (t.map(_.toInt.toLong).sum % 100).toFloat))
}
