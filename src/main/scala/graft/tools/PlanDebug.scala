package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics: print the executed plan + codegen summary of one
  * SparkEntry query (dev aid; not part of the driver contract). */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_stacked_blocks")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.execution.WholeStageCodegenExec")
      .setLevel(org.apache.log4j.Level.INFO)
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen")
      .setLevel(org.apache.log4j.Level.INFO)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"rerun: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    val df2 = graft.SparkEntry.queries(name)(spark, dir)
    val t2 = System.nanoTime()
    df2.write.format("noop").mode("overwrite").save()
    println(f"hml8k run: ${(System.nanoTime() - t2) / 1e9}%.2f s")
    val t3 = System.nanoTime()
    df2.write.format("noop").mode("overwrite").save()
    println(f"hml8k rerun: ${(System.nanoTime() - t3) / 1e9}%.2f s")
    spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
    val plan = df.queryExecution.executedPlan.toString
    println("== stats ==")
    println("plan lines: " + plan.linesIterator.size)
    println("WholeStageCodegen spans: " +
      "WholeStageCodegen".r.findAllIn(plan).size)
    println("Project nodes: " + "Project".r.findAllIn(plan).size)
    println("TakeOrderedAndProject nodes: " +
      "TakeOrderedAndProject".r.findAllIn(plan).size)
    println("Window nodes: " + "\\bWindow\\b".r.findAllIn(plan).size)
    println("Exchange nodes: " + "Exchange".r.findAllIn(plan).size)
    spark.stop()
  }
}
