package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship `SparkEntry.entry` exactly as the driver
  * does (rows > 0 on sf0.001) and show the physical plan for review. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    if (args.contains("--explain")) df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows=$n cols=${df.columns.length}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
