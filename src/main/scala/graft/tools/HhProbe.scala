package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a driver contract): time q_heavy_hitters' component
  * passes separately — tokenization+count, MG candidate pass, confirm
  * pass — to locate the compute. */
object HhProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tokens = graft.text.CorpusOps.wordNgrams(
      graft.text.CorpusOps.words(col("text")), 2)
    def time[A](label: String)(f: => A): A = {
      var r = null.asInstanceOf[A]
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); r = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.map(t => f"$t%.2f").mkString(" / ")} s")
      r
    }
    // warmup
    docs.select(explode(tokens).as("token")).agg(count(lit(1))).head()
    time("tokenize+explode+count")(
      docs.select(explode(tokens).as("token")).agg(count(lit(1))).head())
    time("tokenize+size-sum (no explode)")(
      docs.select(size(tokens).as("n")).agg(sum("n")).head())
    val toks = docs.select(explode(tokens).as("token"))
    val row = time("MG candidate pass")(toks.agg(
      graft.functions.FrequentItems.mgCandidates(col("token"), 2000)
        .as("cand"), count(lit(1)).as("n")).head())
    val cand: Seq[String] = row.getSeq[String](0)
    println(s"candidates: ${cand.size}")
    time("confirm pass")(
      docs.select(explode(filter(tokens,
          t => t.isInCollection(cand))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 0).agg(count(lit(1))).head())
    time("full HeavyHitters.exact")(
      graft.text.HeavyHitters.exact(docs, tokens, 0.001)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
