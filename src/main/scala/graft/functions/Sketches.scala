package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable cardinality sketch: K-Minimum-Values (Bar-Yossef et
  * al.'s classic distinct-count estimator). Values hash to (0,1) via an
  * md5 40-bit chunk; per group the k smallest distinct hashes are kept
  * and the estimate is (k−1)/h₍ₖ₎ (exact when fewer than k distinct
  * hashes exist).
  *
  * Two properties drive the design: (a) the state per group is k doubles
  * (the shuffle carries ≤ k rows per group after the partial distinct) —
  * the sketch shape that scales to 100 TB group-bys; (b) unlike
  * HLL-based `approx_count_distinct`, every intermediate is DETERMINISTIC
  * md5 arithmetic, so the estimate is reproducible bit-for-bit in the
  * DuckDB oracle — an approximate operator with an exact correctness
  * gate. */
object Sketches {

  private val TWO_POW_40 = 1099511627776.0

  /** (0,1)-uniform deterministic hash of a value (rendered as string). */
  def unitHash(v: Column): Column =
    (conv(substring(md5(v.cast("string")), 1, 10), 16, 10).cast("long")
      .cast("double")) / lit(TWO_POW_40)

  /** SQL mirror of [[unitHash]] over expression `e`. */
  def unitHashSql(e: String): String =
    "CAST(CAST(list_sum(list_transform(generate_series(1, 10), " +
      s"j -> (strpos('0123456789abcdef', substr(md5(CAST($e AS VARCHAR)), " +
      "CAST(j AS INT), 1)) - 1) * (16.0 ** (10 - j)))) AS BIGINT) AS DOUBLE)" +
      s" / $TWO_POW_40"

  /** Appends `approx_distinct` per group.
    *
    * Two-phase top-k: the k smallest hashes of a group equal the k
    * smallest of the union of per-salt k-smallest, so the only window
    * that touches full-cardinality data partitions by (group, salt) —
    * a group with a billion distinct values spreads over `salts` sort
    * tasks instead of serializing into one (the unpartitioned-window
    * scale killer). The second window sees ≤ k·salts rows per group. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 256, salts: Int = 32): DataFrame = {
    val part = groupCols.map(col)
    val hashed = df.select(part :+ unitHash(col(valueCol)).as("__hv"): _*)
      .distinct()
    val local = hashed
      .withColumn("__salt", pmod(hash(col("__hv")), lit(salts)))
      .withColumn("__lrk", row_number().over(
        Window.partitionBy(part :+ col("__salt"): _*).orderBy(col("__hv"))))
      .where(col("__lrk") <= k)
    val ranked = local.withColumn("__rk", row_number().over(
      Window.partitionBy(part: _*).orderBy(col("__hv"))))
      .where(col("__rk") <= k)
    ranked.groupBy(part: _*)
      .agg(count(lit(1)).as("__n"), max(col("__hv")).as("__kth"))
      .select(part :+
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("__kth"))
          .as("approx_distinct"): _*)
  }
}
