package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ml.{EmbeddingTransformer, HttpTransport, MockEmbedder, RowPredictor}

/** The remote-transport seam proven with a REAL client: an in-JVM
  * loopback HttpServer (no network egress) serves the embed/predict
  * wire protocol, and the production [[HttpTransport]] clients run
  * through the unchanged [[EmbeddingTransformer]] / [[RowPredictor]]
  * operators on executor threads. Pins, per the seam's contract:
  * batch-size batching (request count == ceil(nonNull/batch)), bounded
  * concurrency actually overlapping in flight, null→zero-vector fill,
  * 5xx retry-with-backoff recovering to the exact mock results, and
  * 4xx failing fast with exactly one attempt. */
class HttpTransportSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private def base: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  // per-endpoint telemetry the tests assert on
  private val embedHits = new AtomicInteger(0)
  private val flakyHits = new AtomicInteger(0)
  private val badHits = new AtomicInteger(0)
  private val inFlight = new AtomicInteger(0)
  private val maxInFlight = new AtomicInteger(0)

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  /** The MockEmbedder computed SERVER-side — the HTTP path must
    * reproduce the in-process mock bit-for-bit. */
  private def embedResponse(body: String): String = {
    val inputs = mapper.readTree(body).get("inputs")
    val texts = (0 until inputs.size).map(inputs.get(_).asText())
    val root = mapper.createObjectNode()
    val arr = root.putArray("embeddings")
    MockEmbedder(texts).foreach { v =>
      val e = arr.addArray(); v.foreach(e.add)
    }
    root.toString
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(64))
    server.createContext("/embed", (ex: HttpExchange) => {
      embedHits.incrementAndGet()
      respond(ex, 200, embedResponse(readBody(ex)))
    })
    // first two requests 503 (transient outage), then healthy
    server.createContext("/embed_flaky", (ex: HttpExchange) => {
      val body = readBody(ex)
      if (flakyHits.incrementAndGet() <= 2) respond(ex, 503, "warming up")
      else respond(ex, 200, embedResponse(body))
    })
    server.createContext("/embed_bad", (ex: HttpExchange) => {
      badHits.incrementAndGet()
      respond(ex, 400, "malformed batch")
    })
    // deterministic per-row predict: upper-cases the 'text' kwarg,
    // with a short hold so concurrent workers overlap measurably
    server.createContext("/predict", (ex: HttpExchange) => {
      val cur = inFlight.incrementAndGet()
      maxInFlight.getAndUpdate(m => math.max(m, cur))
      try {
        val kw = mapper.readTree(readBody(ex)).get("kwargs")
        Thread.sleep(15)
        val root = mapper.createObjectNode()
        root.putObject("fields")
          .put("upper", kw.get("text").asText().toUpperCase)
        respond(ex, 200, root.toString)
      } finally inFlight.decrementAndGet()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("HTTP embedder through EmbeddingTransformer: batch-size-200 " +
    "batching, null rows -> zero vectors, results == in-process mock") {
    val df = spark.range(450)
      .select(col("id"), when(col("id") % 9 === 0, lit(null))
        .otherwise(concat(lit("doc "), col("id"))).as("text"))
      .repartition(1)
    val viaHttp = EmbeddingTransformer("text",
      HttpTransport.embedder(s"$base/embed", MockEmbedder.dim),
      batchSize = 200, template = None, dim = MockEmbedder.dim)
      .transform(df)
    val viaMock = EmbeddingTransformer("text", MockEmbedder.apply,
      batchSize = 200, template = None, dim = MockEmbedder.dim)
      .transform(df)
    val (h, m) = (viaHttp.collect().map(_.toSeq).toSet,
      viaMock.collect().map(_.toSeq).toSet)
    assert(h == m, "HTTP path must equal the in-process mock path")
    // nulls never reach the wire; 450 rows / batch 200 = 3 batches
    assert(embedHits.get == 3,
      s"expected 3 batched POSTs, saw ${embedHits.get}")
    val zeroRows = viaHttp.where(col("text").isNull)
      .select(col("text_embedding")).collect()
    assert(zeroRows.nonEmpty && zeroRows.forall(
      _.getSeq[Float](0).forall(_ == 0.0f)), "null rows get zero vectors")
  }

  test("5xx retry: two 503s then healthy -> exact results anyway, with " +
    "the retries visible in the server hit count") {
    val df = spark.range(60)
      .select(col("id"), concat(lit("r"), col("id")).as("text"))
      .repartition(1)
    val out = EmbeddingTransformer("text",
      HttpTransport.embedder(s"$base/embed_flaky", MockEmbedder.dim,
        maxRetries = 3, backoffMs = 5),
      batchSize = 200, template = None, dim = MockEmbedder.dim)
      .transform(df)
    val expect = EmbeddingTransformer("text", MockEmbedder.apply,
      batchSize = 200, template = None, dim = MockEmbedder.dim)
      .transform(df)
    assert(out.collect().map(_.toSeq).toSet ==
      expect.collect().map(_.toSeq).toSet)
    assert(flakyHits.get == 3,
      s"1 batch + 2 retried 503s = 3 hits, saw ${flakyHits.get}")
  }

  test("4xx fails fast: exactly one attempt, no retry storm") {
    val df = spark.range(10)
      .select(col("id"), concat(lit("x"), col("id")).as("text"))
      .repartition(1)
    val err = intercept[org.apache.spark.SparkException] {
      EmbeddingTransformer("text",
        HttpTransport.embedder(s"$base/embed_bad", MockEmbedder.dim,
          maxRetries = 3, backoffMs = 5),
        batchSize = 200, template = None, dim = MockEmbedder.dim)
        .transform(df).collect()
    }
    assert(err.getMessage.contains("not retryable") ||
      Option(err.getCause).exists(_.getMessage.contains("not retryable")))
    assert(badHits.get == 1,
      s"4xx must not be retried: saw ${badHits.get} attempts")
  }

  test("HTTP predictFn through RowPredictor at concurrency 50: results " +
    "match, and the partition pool genuinely overlaps requests") {
    val df = spark.range(300)
      .select(col("id"), concat(lit("word"), col("id")).as("text"))
      .repartition(2)
    val out = RowPredictor(Seq("text"), Seq("upper"),
      HttpTransport.predictFn(s"$base/predict", backoffMs = 5),
      batchSize = 200, concurrency = 50).transform(df)
    val rows = out.select(col("text"), col("upper")).collect()
    assert(rows.length == 300)
    assert(rows.forall(r => r.getString(1) == r.getString(0).toUpperCase))
    assert(maxInFlight.get > 8,
      s"concurrency-50 pool should overlap requests; peak in-flight " +
        s"was ${maxInFlight.get}")
  }
}
