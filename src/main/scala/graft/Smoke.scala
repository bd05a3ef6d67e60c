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
      // Stages whose generated method exceeds HotSpot's 8000-byte JIT
      // threshold would run as INTERPRETED bytecode (measured 4x slower
      // on the deep transformer projection chains); at this limit Spark
      // falls back to per-operator codegen, which JITs fine.
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
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
