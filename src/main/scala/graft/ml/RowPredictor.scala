package graft.ml

import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.operators.GraftTransformer

/** Executor-side batched row→LLM predictor — the dataflow core of the
  * reference's DSPyMator (dspymator.py:19-513): selected columns map to a
  * request per row (dspymator.py:361-371), requests run with bounded
  * concurrency (semaphore of 50, dspymator.py:177,394-417), outputs land
  * in new columns. The model call is a pluggable
  * `Map[String,String] => Map[String,String]` — an HTTP LLM client in
  * production, a deterministic mock in tests. The prompt-optimizer
  * `fit` loop of the reference is driver-side orchestration around this
  * same operator, not a separate dataflow (SURVEY.md §2.7).
  *
  * mapPartitions + grouped batches: each partition creates one thread
  * pool of `concurrency` workers, so a 1000-executor job sustains
  * 1000×concurrency in-flight requests — same shape as the reference's
  * asyncio semaphore, but distributed.
  */
case class RowPredictor(
    inputCols: Seq[String],
    outputFields: Seq[String],
    predictFn: Map[String, String] => Map[String, String],
    batchSize: Int = 200,
    concurrency: Int = 50,
    // when predictFn came from the Transports registry, its NAME — the
    // persistence seam (see EmbeddingTransformer.transportName)
    transportName: Option[String] = None) extends GraftTransformer {

  def outputNames: Seq[String] = outputFields

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++
      outputFields.map(f => StructField(f, StringType, true)))
    val idxs = inputCols.map(df.schema.fieldIndex)
    val (ins, outs, bs, conc, fn) =
      (inputCols, outputFields, batchSize, concurrency, predictFn)
    val rdd = df.rdd.mapPartitions { it =>
      val pool = Executors.newFixedThreadPool(conc)
      // the pool dies with the TASK, not with iterator exhaustion — a
      // downstream limit/take that abandons the iterator mid-partition
      // must not leak threads
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val result = it.grouped(bs).flatMap { batch =>
        val futures = batch.map { r =>
          val kwargs = ins.zip(idxs).map { case (c, i) =>
            c -> (if (r.isNullAt(i)) "" else r.get(i).toString)
          }.toMap
          Future(fn(kwargs))
        }
        batch.zip(futures).map { case (r, f) =>
          val res = Await.result(f, Duration.Inf)
          Row.fromSeq(r.toSeq ++ outs.map(o => res.getOrElse(o, null)))
        }
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = result.hasNext
          if (!h) { pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS) }
          h
        }
        def next(): Row = result.next()
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

object RowPredictor {
  /** Construct against a REGISTERED transport
    * (Transports.registerPredictor) — the persistable form: PipelineIO
    * stores the transport name and re-binds the function at load. */
  def named(transportName: String, inputCols: Seq[String],
      outputFields: Seq[String], batchSize: Int = 200,
      concurrency: Int = 50): RowPredictor =
    RowPredictor(inputCols, outputFields,
      Transports.predictor(transportName), batchSize, concurrency,
      Some(transportName))
}

/** Prompt-optimizer analog of DSPyMator.fit's optional compile step
  * (dspymator.py:271-318): evaluate candidate prompt variants (each a
  * full predict function) on a labeled frame with a caller-supplied
  * metric, keep the best. The loop is driver-side orchestration — each
  * candidate's evaluation is a distributed RowPredictor pass. */
object PromptSearch {
  case class Result(best: Map[String, String] => Map[String, String],
      bestScore: Double, history: Seq[(Int, Double)])

  def compile(train: DataFrame, inputCols: Seq[String],
      outputFields: Seq[String],
      candidates: Seq[Map[String, String] => Map[String, String]],
      metric: DataFrame => Double, batchSize: Int = 200,
      concurrency: Int = 50): Result = {
    val scored = candidates.zipWithIndex.map { case (fn, i) =>
      val out = RowPredictor(inputCols, outputFields, fn, batchSize,
        concurrency).transform(train)
      (fn, i, metric(out))
    }
    val best = scored.maxBy(_._3)
    Result(best._1, best._3, scored.map(s => (s._2, s._3)))
  }
}

/** Driver-side architecture search keeping the best estimator by
  * validation R² — the meta-loop shape of the reference's KerasCortex
  * (keras_cortex.py:44-175) with the LLM "propose new build_model source"
  * step replaced by a pluggable candidate list (code-gen+exec is a
  * Python-ecosystem feature, SURVEY.md §2.7): each candidate trains via
  * the distributed MLPRegressor, the loop itself is orchestration, not
  * dataflow. */
object CortexSearch {
  case class Result(best: MLPRegressor, bestR2: Double,
      history: Seq[(Int, Double)])

  def search(train: DataFrame, valid: DataFrame, featureCols: Seq[String],
      targetCol: String, hiddenCandidates: Seq[Int] = Seq(4, 16, 64),
      epochs: Int = 100): Result = {
    val scored = hiddenCandidates.map { h =>
      val m = new MLPRegressor(featureCols, targetCol, hidden = h,
        lr = 0.05, epochs = epochs).fit(train)
      val r2 = Metrics.r2(m.predict(valid), "prediction", targetCol,
        Seq.empty).collect()(0).getDouble(0)
      (m, h, r2)
    }
    val best = scored.maxBy(_._3)
    Result(best._1, best._3, scored.map(s => (s._2, s._3)))
  }
}
