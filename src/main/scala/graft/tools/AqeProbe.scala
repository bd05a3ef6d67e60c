package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: run ONE declared query to completion and print the
  * EXECUTED (final AQE) plan — shows whether coalescing / runtime join
  * rewrites actually fired under the bench session config. */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_LIMIT", "8000"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "131072"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
