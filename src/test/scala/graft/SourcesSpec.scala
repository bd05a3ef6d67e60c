package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

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
    val ev = graft.sources.Events.load(spark, sf)
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

  test("streaming ingest-time near-dup screening: per-batch results " +
    "equal the incremental batch composition, the corpus accumulates " +
    "across micro-batches, and streaming state is zero rows") {
    import graft.streaming.IngestDedup
    val root = java.nio.file.Files.createTempDirectory("graft-ingest")
    val (src, corpus, results) =
      (s"$root/src", s"$root/corpus", s"$root/results")
    // seed the at-rest corpus with the already-ingested doc 100
    val initial = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    IngestDedup.hashes(initial, "doc_id", "text")
      .write.parquet(corpus)
    // two source files = two micro-batches (maxFilesPerTrigger = 1);
    // file A must be strictly older so batch order is deterministic
    val batchA = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // dup of seeded 100
      (2L, "completely different text here now")   // clean
    ).toDF("doc_id", "text")
    val batchB = Seq(
      (3L, "completely different text here now"),  // dup of batch-A doc 2
      (4L, "unique snowflake content entirely")    // clean
    ).toDF("doc_id", "text")
    batchA.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtime second → stable file order
    batchB.coalesce(1).write.mode("append").parquet(src)
    val q = IngestDedup.screenStream(spark, src, corpus, results,
      "doc_id", "text",
      checkpointDir = Some(s"$root/ckpt"))
    q.processAllAvailable()
    val state = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    q.stop()
    val streamed = IngestDedup.readAll(spark, results)
      .select("doc_id", "hamming", "matched_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch composition of the SAME incremental semantics: A screens
    // against the seed, B against seed ∪ A
    val hA = IngestDedup.hashes(batchA, "doc_id", "text")
    val hSeed = IngestDedup.hashes(initial, "doc_id", "text")
    val expect = (
      Dedup.simHashScreen(hA, hSeed, "doc_id").collect() ++
      Dedup.simHashScreen(IngestDedup.hashes(batchB, "doc_id", "text"),
        hSeed.union(hA), "doc_id").collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expect)
    // doc 3 only matches because the corpus GREW with batch A
    assert(streamed == Set((1L, 0L, 100L), (3L, 0L, 2L)))
    // foreachBatch against data-at-rest: the stream itself holds no state
    assert(state.forall(_.numRowsTotal == 0),
      s"expected zero streaming state rows, got $state")
  }

  test("streaming ingest-time screening RESTART: with a checkpoint, a " +
    "restarted query resumes after the committed batches — results and " +
    "corpus hold no duplicates and new batches still screen correctly") {
    import graft.streaming.IngestDedup
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
    val (src, corpus, results, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/results", s"$root/ckpt")
    IngestDedup.hashes(
      Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text").write.parquet(corpus)
    Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely different text here now")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = IngestDedup.screenStream(spark, src, corpus, results,
      "doc_id", "text", checkpointDir = Some(ckpt))
    q1.processAllAvailable(); q1.stop()
    val afterFirst = IngestDedup.readAll(spark, corpus).count()
    // restart with the SAME checkpoint; add one new file with a dup of
    // doc 2 — the committed batch must NOT replay (corpus would double
    // and doc 3 would then also exact-match doc 1's duplicate hash)
    Thread.sleep(1100)
    Seq((3L, "completely different text here now")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = IngestDedup.screenStream(spark, src, corpus, results,
      "doc_id", "text", checkpointDir = Some(ckpt))
    q2.processAllAvailable(); q2.stop()
    val corpusIds = IngestDedup.readAll(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(corpusIds.length == corpusIds.distinct.length,
      s"restart must not re-append committed batches: $corpusIds")
    assert(corpusIds.toSet == Set(100L, 1L, 2L, 3L))
    assert(IngestDedup.readAll(spark, corpus).count() == afterFirst + 1)
    val streamed = IngestDedup.readAll(spark, results)
      .select("doc_id", "hamming", "matched_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == Set((1L, 0L, 100L), (3L, 0L, 2L)), streamed.toString)
  }

  test("streaming corpus curation: the quality filter runs unchanged " +
    "under readStream and matches the batch keep-set") {
    import graft.text.QualityFilterTransformer
    val src = java.nio.file.Files.createTempDirectory("graft-squal").toFile
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.mode("overwrite").parquet(src.getAbsolutePath)
    val qf = QualityFilterTransformer("text")
    // map-side curation composes with streaming ingest as-is: stateless
    // projections need no watermark/output-mode ceremony
    val stream = qf.transform(
      spark.readStream.schema(docs.schema).parquet(src.getAbsolutePath))
      .where(col("qf_keep")).select("doc_id")
    val q = stream.writeStream.format("memory").queryName("qual_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.table("qual_stream")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    val batch = qf.transform(docs).where(col("qf_keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming corpus curation: hashSplit and chunk run unchanged " +
    "under readStream and match their batch outputs") {
    import graft.text.CorpusSplit
    val src = java.nio.file.Files.createTempDirectory("graft-scurate").toFile
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.mode("overwrite").parquet(src.getAbsolutePath)
    val streamIn = spark.readStream.schema(docs.schema)
      .parquet(src.getAbsolutePath)
    // both ops are stateless projections/explodes — they compose with a
    // streaming source as-is, no watermark/output-mode ceremony
    val q1 = streamIn
      .select(col("doc_id"), CorpusSplit.hashSplit(col("doc_id")).as("split"))
      .writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    val q2 = CorpusSplit.chunk(streamIn, "doc_id", "text",
      chunkSize = 64, stride = 32)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    q1.processAllAvailable(); q2.processAllAvailable()
    val splitS = spark.table("split_stream").collect().map(_.toSeq).toSet
    val chunkS = spark.table("chunk_stream").collect().map(_.toSeq).toSet
    q1.stop(); q2.stop()
    val splitB = docs
      .select(col("doc_id"), CorpusSplit.hashSplit(col("doc_id")).as("split"))
      .collect().map(_.toSeq).toSet
    val chunkB = CorpusSplit.chunk(docs, "doc_id", "text",
      chunkSize = 64, stride = 32).collect().map(_.toSeq).toSet
    assert(splitS == splitB && splitB.nonEmpty)
    assert(chunkS == chunkB && chunkB.nonEmpty)
  }

  test("events ingestion is layout-adaptive: long-nanos, timestamp[us] " +
    "and timestamp_ntz parquet all yield the identical tumbling result") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import graft.streaming.EventStream
    // round-7 regression guard: the driver's regenerated events.parquet
    // switched TIMESTAMP(NANOS) -> timestamp[us] NTZ and every event-time
    // query died at analysis; Events.adapt must accept all three layouts
    val base = Seq(
      (1L, 1L, "click", 1.5, 1700000000000000L),
      (2L, 1L, "view", 2.0, 1700000300000000L),
      (3L, 2L, "click", 0.5, 1700003600000000L),
      (4L, 2L, "purchase", 9.0, 1700007200000000L)
    ).toDF("event_id", "user_id", "event_type", "value", "us")
    val keep = Seq($"event_id", $"user_id", $"event_type", $"value")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    base.select(keep :+ (col("us") * 1000L).as("ts"): _*)
      .write.parquet(s"$tmp/long")
    base.select(keep :+ expr("timestamp_micros(us)").as("ts"): _*)
      .write.parquet(s"$tmp/ltz")
    base.select(keep :+ expr("timestamp_micros(us)")
        .cast("timestamp_ntz").as("ts"): _*)
      .write.parquet(s"$tmp/ntz")
    // each fixture must genuinely exercise its branch
    assert(spark.read.parquet(s"$tmp/long").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$tmp/ntz").schema("ts").dataType ==
      TimestampNTZType)
    def res(p: String): Set[Seq[Any]] = EventStream.tumbling(
      graft.sources.Events.adapt(spark.read.parquet(p)), "1 hour")
      .select(unix_micros(col("ws")).as("ws"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val want = res(s"$tmp/long")
    assert(want.nonEmpty)
    assert(res(s"$tmp/ltz") == want)
    assert(res(s"$tmp/ntz") == want)
  }
}

/** Bucketing: the co-located-join scale path (builder brief: "bucketing
  * for co-located joins"). Two tables bucketed+sorted on the join key
  * join with ZERO exchanges — at 100 TB this removes the dominant
  * shuffle of repeated fact-fact joins. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans no Exchange") {
    // managed tables land in the session's default warehouse dir and are
    // DROPped (files included) at the end
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.select("l_suppkey", "l_extendedprice").write
      .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
      .mode("overwrite").saveAsTable("b_price")
    li.select("l_suppkey", "l_quantity").write
      .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
      .mode("overwrite").saveAsTable("b_qty")
    // force the sort-merge path (at fact-fact scale neither side
    // broadcasts); bucketing must then satisfy the join's distribution
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_price").join(spark.table("b_qty"),
        "l_suppkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE b_price")
      spark.sql("DROP TABLE b_qty")
    }
  }

  test("hive-partitioned corpus layout: a language filter becomes a " +
    "PartitionFilter — pruned directories, no data read from other " +
    "languages") {
    import org.apache.spark.sql.functions._
    // the routing step after language-ID: write the corpus partitioned
    // by lang so per-language pipelines scan only their directory
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toFile
    try {
      docs.write.partitionBy("lang").mode("overwrite")
        .parquet(tmp.getAbsolutePath)
      val back = spark.read.parquet(tmp.getAbsolutePath)
      val one = back.where(col("lang") === "en")
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(lang"),
        s"language filter must prune partitions:\n$plan")
      // the pruned scan reads exactly the en partition's rows, and the
      // planner selects only that partition's directory
      val want = docs.where(col("lang") === "en").count()
      assert(one.count() == want && want > 0)
      val scans = one.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      val selected = scans.head.selectedPartitions.toPartitionArray
        .map(_.urlEncodedPath).toSeq
      assert(selected.nonEmpty &&
        selected.forall(_.contains("lang=en")),
        s"non-en files selected: ${selected.filterNot(_.contains("lang=en"))}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }
}

/** flatMapGroupsWithState sessionization: closed sessions emit when a
  * later event arrives or the watermark passes the gap. */
class CompletedSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a session closes on the next event after the gap; the timeout " +
    "flushes the final session once the watermark passes") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("graft-fs").toFile
    val base = 1700000000000L // epoch ms
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ms", "value")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
        .write.mode("append").parquet(dir.getAbsolutePath)
    // batch 1: two events 5 min apart (one session)
    write(Seq((7L, base, 1.0), (7L, base + 5 * 60 * 1000, 2.0)))
    val q = EventStream.completedSessionsStream(spark, dir.getAbsolutePath,
      "sessions_done_test", gapMs = 30L * 60 * 1000,
      watermark = "1 minute")
    q.processAllAvailable()
    assert(spark.table("sessions_done_test").count() == 0,
      "session still open — nothing emitted yet")
    // batch 2: an event 10 hours later closes session 1 via the gap rule
    // AND advances the watermark far past session 1's timeout
    write(Seq((7L, base + 10L * 3600 * 1000, 5.0)))
    q.processAllAvailable()
    // one more empty-ish batch lets the timeout for session 2 fire only
    // if the watermark passes it — it shouldn't (no later data)
    val got = spark.table("sessions_done_test")
      .select("user_id", "session_start", "n_events", "sum_value")
      .collect().map(_.toSeq)
    q.stop()
    assert(got.length == 1, s"exactly session 1 emitted: ${got.toSeq}")
    assert(got(0) == Seq(7L, base, 2L, 3.0))
  }
}

/** Multimodal frame-sample / resize plumbing (stub codec). */
class MediaStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.multimodal.BinaryPipeline

  test("sampleFrames: n evenly-spaced frames, bounded width; resize: " +
    "fixed-size output") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("id", "t")
    val media = BinaryPipeline.synthesizeMedia(df, "t")
    val frames = BinaryPipeline.sampleFrames(media, "media", nFrames = 3,
      frameBytes = 8).select($"frame_idx", $"frame".cast("string"))
      .orderBy("frame_idx").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(frames.length == 3)
    assert(frames(0) == (0, "abcdefgh"))   // offset 0
    assert(frames(1) == (1, "mnopqrst"))   // offset floor(36/3) = 12
    assert(frames(2) == (2, "yz012345"))   // offset 24
    val resized = BinaryPipeline.resize(media, "media", 8)
      .select(length($"media_resized")).collect()(0).getInt(0)
    assert(resized == 8)
    val padded = BinaryPipeline.resize(
      BinaryPipeline.synthesizeMedia(Seq((1L, "ab")).toDF("id", "t"), "t"),
      "media", 8).select(length($"media_resized")).collect()(0).getInt(0)
    assert(padded == 8)
  }

  test("REAL codec through the same plumbing: javax.imageio decodes PNG " +
    "and BMP fixture bytes inside the batched mapPartitions stage; " +
    "driver-side decode matches, corrupt/null payloads yield zeros") {
    import graft.multimodal.ImageIoDecoder
    import java.awt.image.BufferedImage
    // two 8x8 fixtures: a vertical-gradient PNG and a solid-red BMP
    def encode(fmt: String, paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, paint(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = encode("png", (_, y) => { val v = y * 32; (v << 16) | (v << 8) | v })
    val bmp = encode("bmp", (_, _) => 0xff0000)
    val rows = Seq(
      (1L, png), (2L, bmp),
      (3L, "not an image at all".getBytes("UTF-8")), // no reader accepts
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = spark.createDataFrame(rows).toDF("id", "media").repartition(2)
    val got = BinaryPipeline.extractFeatures(df, "media", dim = 4,
      batchSize = 2, decoder = ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    // the distributed decode equals a driver-side decode of the same bytes
    assert(got(1L) == ImageIoDecoder.decode(png, 4).toSeq)
    assert(got(2L) == ImageIoDecoder.decode(bmp, 4).toSeq)
    // gradient strips: luma strictly increases strip to strip; red BMP:
    // every strip = Rec.601 red luma 0.299 — real pixels, not byte noise
    assert(got(1L).sliding(2).forall(p => p(0) < p(1)), got(1L).toString)
    assert(got(2L).forall(v => math.abs(v - 0.299f) < 1e-3), got(2L).toString)
    assert(got(3L) == Seq.fill(4)(0.0f) && got(4L) == Seq.fill(4)(0.0f))
  }

  test("REAL audio codec through the same plumbing: javax.sound " +
    "decodes WAV fixture bytes (mono ramp + stereo) inside the batched " +
    "stage; driver decode matches, corrupt/null payloads yield zeros") {
    import graft.multimodal.WavPcmDecoder
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], channels: Int): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // mono amplitude ramp: band RMS must strictly increase band to band
    val ramp = wav(Array.tabulate(400)(i =>
      (i * 70).toShort), channels = 1)
    // stereo: L = +8000, R = -8000 → mixdown 0, every band RMS = 0
    val stereo = wav(Array.tabulate(200)(i =>
      if (i % 2 == 0) 8000.toShort else (-8000).toShort), channels = 2)
    val rows = Seq(
      (1L, ramp), (2L, stereo),
      (3L, "not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = spark.createDataFrame(rows).toDF("id", "media").repartition(2)
    val got = BinaryPipeline.extractFeatures(df, "media", dim = 4,
      batchSize = 2, decoder = WavPcmDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    // the distributed decode equals a driver-side decode of the same bytes
    assert(got(1L) == WavPcmDecoder.decode(ramp, 4).toSeq)
    assert(got(2L) == WavPcmDecoder.decode(stereo, 4).toSeq)
    // ramp: real PCM amplitudes, monotone RMS across time bands
    assert(got(1L).sliding(2).forall(p => p(0) < p(1)), got(1L).toString)
    // stereo mixdown of an antiphase pair cancels exactly
    assert(got(2L).forall(_ == 0.0f), got(2L).toString)
    assert(got(3L) == Seq.fill(4)(0.0f) && got(4L) == Seq.fill(4)(0.0f))
  }

  test("REAL video codec through the same plumbing (VERDICT r12 " +
    "item 7): MJPEG-in-AVI frames decode inside the batched stage — " +
    "RIFF walk finds the movi frames past a dummy hdrl, each JPEG " +
    "decodes to real pixels; driver decode matches, corrupt / " +
    "frameless / null payloads yield zeros") {
    import graft.multimodal.MjpegAviDecoder
    import java.awt.image.BufferedImage
    def jpegGray(level: Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    // minimal RIFF/AVI writer: chunk = id + le-u32 size + body (+ pad)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(id.getBytes("US-ASCII"))
      val sz = body.length
      bos.write(Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte,
        (sz >> 24).toByte))
      bos.write(body)
      if ((sz & 1) == 1) bos.write(0) // even padding
      bos.toByteArray
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
      val movi = list("movi",
        frames.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
        chunk("idx1", new Array[Byte](16))
      chunk("RIFF", body)
    }
    // 4 frames of strictly increasing gray — time-band luma must climb
    val levels = Seq(40, 90, 140, 190)
    val video = avi(levels.map(jpegGray))
    val frameless = avi(Nil)
    val rows = Seq(
      (1L, video), (2L, frameless),
      (3L, "definitely not RIFF".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = spark.createDataFrame(rows).toDF("id", "media").repartition(2)
    val got = BinaryPipeline.extractFeatures(df, "media", dim = 4,
      batchSize = 2, decoder = MjpegAviDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    // the distributed decode equals a driver-side decode of the same bytes
    assert(got(1L) == MjpegAviDecoder.decode(video, 4).toSeq)
    // 4 frames into 4 time bands: one frame each, luma strictly climbs
    // (JPEG is lossy but monotone gray survives quantization), and each
    // band sits near its source gray level — real pixels, not byte noise
    assert(got(1L).sliding(2).forall(p => p(0) < p(1)), got(1L).toString)
    levels.zipWithIndex.foreach { case (lv, i) =>
      assert(math.abs(got(1L)(i) - lv / 255.0f) < 0.05f,
        s"band $i: ${got(1L)(i)} vs gray $lv")
    }
    assert(got(2L) == Seq.fill(4)(0.0f), "frameless AVI must yield zeros")
    assert(got(3L) == Seq.fill(4)(0.0f) && got(4L) == Seq.fill(4)(0.0f))
  }
}
