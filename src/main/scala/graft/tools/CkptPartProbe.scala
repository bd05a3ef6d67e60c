package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics: does `repartition(col).localCheckpoint()`
  * preserve its hash partitioning into downstream joins/aggregations
  * (no new Exchange), and does one shared explicit repartition get
  * reused by two consumers under AQE? (dev aid; not driver contract) */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = (1L to 10000L).map(i => (i, i % 97)).toDF("id", "x")

    println("=== A: checkpointed repartition(id) -> groupBy(id) ===")
    val ck = base.repartition(col("id")).localCheckpoint(eager = true)
    val agg = ck.groupBy("id").agg(sum("x"))
    agg.write.format("noop").mode("overwrite").save()
    println(agg.queryExecution.executedPlan.toString.take(1500))

    println("=== B: checkpointed repartition(id) join checkpointed repartition(id) ===")
    val ck2 = base.withColumnRenamed("x", "y")
      .repartition(col("id")).localCheckpoint(eager = true)
    val j = ck.hint("merge").join(ck2, "id")
    j.write.format("noop").mode("overwrite").save()
    println(j.queryExecution.executedPlan.toString.take(2000))

    println("=== C: one shared repartition, two consumers ===")
    val sh = base.repartition(col("id"))
    val mins = sh.groupBy("id").agg(min("x").as("mn"))
    val out = sh.hint("merge").join(mins, "id")
    out.write.format("noop").mode("overwrite").save()
    println(out.queryExecution.executedPlan.toString.take(2500))
  }
}
