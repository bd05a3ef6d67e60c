package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.1 source/sink completeness: the engine round-trips CSV and JSON
  * (schema-applied reads — never schema inference on a 100 TB ingest) and
  * the streaming exact-dedup keeps bounded per-key state. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("csv + json sinks/sources round-trip the events table " +
    "value-exactly under an explicit schema") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString
    ev.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    ev.write.mode("overwrite").json(s"$tmp/json")
    val csv = spark.read.schema(ev.schema).option("header", "true")
      .csv(s"$tmp/csv")
    val json = spark.read.schema(ev.schema).json(s"$tmp/json")
    val want = ev.collect().map(_.toSeq).toSet
    assert(csv.collect().map(_.toSeq).toSet == want)
    assert(json.collect().map(_.toSeq).toSet == want)
  }

  test("streaming dedup (dropDuplicatesWithinWatermark): kept keys equal " +
    "the batch distinct-key set; one row per key") {
    import graft.streaming.EventStream
    val src = java.nio.file.Files.createTempDirectory("graft-sdedup").toFile
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    ev.write.mode("overwrite").parquet(src.getAbsolutePath)
    val q = EventStream.dedupStream(spark, src.getAbsolutePath,
      "dedup_stream_test", Seq("user_id", "event_type"))
    q.processAllAvailable()
    val streamed = spark.table("dedup_stream_test")
      .select("user_id", "event_type").collect().map(_.toSeq)
    q.stop()
    val batchKeys = ev.select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(streamed.toSet == batchKeys)
    assert(streamed.length == batchKeys.size, "exactly one row per key")
  }
}
