package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Time ONE declared query with a stage/job listener and print where the
  * wall clock goes: per-job wall time (with the job description/callsite)
  * and per-stage executor metrics (task time, shuffle bytes, input bytes).
  * Optimization-round instrumentation (guide §1: measure first) — the UI
  * is disabled in this environment, so this is the measurement seam.
  *
  * Usage: StageProfile <sfDir> <query> [repeats]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val repeats = if (args.length > 2) args(2).toInt else 2
    val fn = graft.SparkEntry.queries(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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

    case class JobRec(desc: String, start: Long, var end: Long = 0L,
      stages: mutable.Buffer[String] = mutable.Buffer.empty)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(desc, e.time)
          e.stageIds.foreach(s => stageJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        val line = f"    stage ${si.stageId}%4d ${si.name.take(60)}%-60s " +
          f"tasks=${si.numTasks}%4d exec=${tm.executorRunTime}%6dms " +
          f"cpu=${tm.executorCpuTime / 1000000}%6dms " +
          f"shufR=${tm.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
          f"shufW=${tm.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
          f"in=${tm.inputMetrics.bytesRead / 1024}%8dKB " +
          f"gc=${tm.jvmGCTime}%5dms fetchW=${
            tm.shuffleReadMetrics.fetchWaitTime}%5dms " +
          f"spill=${tm.memoryBytesSpilled / 1024}%6dKB " +
          f"deser=${tm.executorDeserializeTime}%5dms " +
          f"resSer=${tm.resultSerializationTime}%4dms"
        jobs.synchronized {
          stageJob.get(si.stageId).flatMap(jobs.get)
            .foreach(_.stages += line)
        }
      }
    }

    // warmup pass (uncounted, like Bench)
    try {
      graft.SparkEntry.entry(spark).count()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"warmup failed: ${e.getMessage}")
    }

    spark.sparkContext.addSparkListener(listener)
    var best = Double.MaxValue
    for (r <- 1 to repeats) {
      jobs.synchronized { jobs.clear(); stageJob.clear() }
      spark.catalog.clearCache()
      graft.operators.GraftTransformer.unpersistAll()
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      best = math.min(best, dt)
      println(f"\n===== pass $r: $name total ${dt}%.3f s =====")
      // drain listener events (listenerBus is private[spark]; a short
      // sleep is enough for a profiling tool)
      Thread.sleep(300)
      var prevEnd = 0L
      jobs.synchronized {
        val first = jobs.values.headOption.map(_.start).getOrElse(0L)
        jobs.foreach { case (id, j) =>
          val gap = if (prevEnd == 0) 0 else j.start - prevEnd
          prevEnd = j.end
          println(f"job $id%4d +${j.start - first}%6dms wall=${j.end - j.start}%6dms gap=$gap%5dms  ${j.desc.take(90)}")
          j.stages.foreach(println)
        }
      }
    }
    println(f"\nBEST: $name $best%.3f s over $repeats passes")
    spark.stop()
  }
}
