package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml._
import graft.operators.MovingAverageTransformer
import graft.multimodal.BinaryPipeline

/** ML-surface queries (SURVEY.md §2.7-§2.8): PCA, MLP scoring, the
  * batched embedding harness, R², media feature plumbing.
  *
  * q_mlp_score pins deterministic literal weights so the broadcast-weights
  * forward pass verifies against a DuckDB oracle generated from the SAME
  * weight values (training itself is pinned by MLSpec properties, not an
  * oracle — iterative float training is not SQL-expressible).
  */
object QueriesML {

  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic pinned weights for the scoring query (3 → 4 → 1). */
  val pinned: MLPWeights = MLPWeights(
    w1 = Array.tabulate(3, 4)((i, j) => ((i * 7 + j * 3) % 10 - 5) / 10.0),
    b1 = Array.tabulate(4)(j => (j - 2) / 10.0),
    w2 = Array.tabulate(4)(j => ((j * 5) % 7 - 3) / 10.0),
    b2 = 0.05)
  private val mlpFeats = Seq("l_quantity", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PCA latent codes (exact covariance PCA; sign of components is
    // implementation-defined → rows-only check + MLSpec variance test)
    "q_pca" -> ((s, dir) => {
      DimReducer(Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax"), 2)
        .fitTransform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"), col("dim_0"),
          col("dim_1"))
    }),

    // broadcast-weights MLP forward pass, codegen'd arithmetic
    "q_mlp_score" -> ((s, dir) => {
      val m = new MLPRegressor(mlpFeats, "l_extendedprice")
      li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        round(m.predictColumn(pinned,
          mlpFeats.map(c => col(c).cast("double"))), 6).as("score"))
    }),

    // batched embedding harness with the reference's deterministic mock
    "q_embed" -> ((s, dir) => {
      EmbeddingTransformer("text", MockEmbedder.apply, batchSize = 200,
        dim = MockEmbedder.dim)
        .transform(docs(s, dir))
        .select(col("doc_id"),
          element_at(col("text_embedding"), 1).cast("double").as("e0"),
          element_at(col("text_embedding"), 2).cast("double").as("e1"))
    }),

    // R² of a trailing-MA "prediction" vs price, per returnflag
    "q_r2" -> ((s, dir) => {
      val ma = MovingAverageTransformer(Seq("l_extendedprice"), Seq(4),
        "l_suppkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"))
        .transform(li(s, dir))
        .where(col("l_extendedprice_ma4").isNotNull)
      Metrics.r2(ma, "l_extendedprice_ma4", "l_extendedprice",
        Seq("l_returnflag"))
        .select(col("l_returnflag"), round(col("r2"), 6).as("r2"))
    }),

    // global z-score standardization (target-scaling primitive)
    "q_standardize" -> ((s, dir) => {
      graft.operators.StandardScaler(Seq("l_extendedprice"))
        .transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice_std"), 6).as("price_std"))
    }),

    // bounded-concurrency LLM row-predictor harness (deterministic mock)
    "q_row_predict" -> ((s, dir) => {
      val mock: Map[String, String] => Map[String, String] = kw => {
        val t = kw.getOrElse("text", "")
        Map("summary" -> t.take(20).toUpperCase,
          "sentiment" -> (t.length % 3 match {
            case 0 => "neg"; case 1 => "neu"; case 2 => "pos"
          }))
      }
      RowPredictor(Seq("text"), Seq("summary", "sentiment"), mock,
        batchSize = 100, concurrency = 8)
        .transform(docs(s, dir))
        .select(col("doc_id"), col("summary"), col("sentiment"))
    }),

    // multimodal plumbing: synthesize binary media, batched stub decode
    "q_media_features" -> ((s, dir) => {
      val media = BinaryPipeline.synthesizeMedia(docs(s, dir), "text")
      BinaryPipeline.extractFeatures(media, "media", dim = 8)
        .select(col("doc_id"), col("media_meta.width").as("width"),
          round(element_at(col("media_features"), 1).cast("double"), 4)
            .as("f0"),
          round(element_at(col("media_features"), 2).cast("double"), 4)
            .as("f1"))
    })
  )

  private def mlpSql: String = {
    val f = mlpFeats
    val hidden = (0 until 4).map { j =>
      val z = f.zipWithIndex.map { case (c, i) =>
        s"CAST($c AS DOUBLE) * ${pinned.w1(i)(j)}"
      }.mkString("(", " + ", s" + ${pinned.b1(j)})")
      s"greatest($z, 0.0)"
    }
    val out = hidden.zipWithIndex.map { case (h, j) =>
      s"$h * ${pinned.w2(j)}"
    }.mkString("(", " + ", s" + ${pinned.b2})")
    s"round($out, 6)"
  }

  val oracleSql: Map[String, String] = Map(
    "q_standardize" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_extendedprice - mu) / sd, 6) AS price_std
        |FROM lineitem,
        | (SELECT avg(l_extendedprice) AS mu,
        |         stddev_pop(l_extendedprice) AS sd FROM lineitem)""".stripMargin,
    "q_row_predict" ->
      """SELECT doc_id, upper(substr(text, 1, 20)) AS summary,
        | CASE length(text) % 3 WHEN 0 THEN 'neg' WHEN 1 THEN 'neu'
        |   ELSE 'pos' END AS sentiment
        |FROM documents""".stripMargin,
    "q_mlp_score" ->
      s"""SELECT l_orderkey, l_linenumber, $mlpSql AS score
         |FROM lineitem""".stripMargin,
    "q_embed" ->
      """SELECT doc_id,
        | CAST(CAST(length(text) AS FLOAT) AS DOUBLE) AS e0,
        | CAST(CAST(list_sum(list_transform(generate_series(1, length(text)),
        |   i -> ord(substr(text, CAST(i AS INTEGER), 1)))) % 100 AS FLOAT)
        |   AS DOUBLE) AS e1
        |FROM documents""".stripMargin,
    "q_media_features" -> {
      // mirror of DeterministicDecoder.decode bin j over the sanitized
      // ASCII payload: left-fold of ord(byte)/255.0 at positions j+1,
      // j+1+dim, … (ascending — same accumulation order as the Scala
      // loop), then the same double→float→double cast chain.
      def bin(j: Int) =
        s"""CASE WHEN length(p) > $j THEN
           |  round(CAST(CAST(list_reduce(list_transform(
           |    generate_series(${j + 1}, length(p), 8),
           |    i -> ord(substr(p, CAST(i AS INT), 1)) / 255.0),
           |    (a, b) -> a + b) AS FLOAT) AS DOUBLE), 4)
           |  ELSE 0.0 END""".stripMargin
      s"""WITH s AS (
         |  SELECT doc_id, length(text) % 640 AS width,
         |    regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS p
         |  FROM documents)
         |SELECT doc_id, width,
         |  ${bin(0)} AS f0,
         |  ${bin(1)} AS f1
         |FROM s""".stripMargin
    },

    "q_r2" ->
      """WITH ma AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    CASE WHEN count(l_extendedprice) OVER w = 4
        |         THEN avg(l_extendedprice) OVER w END AS pred
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |), f AS (SELECT * FROM ma WHERE pred IS NOT NULL)
        |SELECT l_returnflag,
        |  round(1.0 - sum(pow(l_extendedprice - pred, 2.0))
        |    / (sum(pow(l_extendedprice, 2.0))
        |       - count(*) * avg(l_extendedprice) * avg(l_extendedprice)), 6)
        |    AS r2
        |FROM f GROUP BY l_returnflag""".stripMargin
  )
}
