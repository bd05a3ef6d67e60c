package graft.ml

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Real HTTP clients for the two pluggable transport seams — the piece a
  * production user plugs into [[EmbeddingTransformer]] (`embedder`) and
  * [[RowPredictor]] (`predictFn`) in place of the deterministic test
  * mocks. The reference's counterparts are its hosted-model clients
  * (embedding.py:39,85 — batched embed endpoint; dspymator.py:177,397 —
  * per-row LLM call under an asyncio semaphore); here the concurrency
  * and batching live in the OPERATORS (mapPartitions pool / grouped
  * batches), so the transport is a plain synchronous JSON POST with
  * retry — one in-flight request per operator worker thread.
  *
  * Wire protocol (both directions JSON, Jackson from the Spark
  * classpath):
  *   embed:   POST {"inputs": [text, …]}   → {"embeddings": [[f, …], …]}
  *   predict: POST {"kwargs": {in: v, …}}  → {"fields": {out: v, …}}
  *
  * Retry policy: IOException and 5xx are retryable (transient server /
  * connection trouble) with exponential backoff, up to `maxRetries`
  * retries; 4xx fails FAST (the request itself is wrong — retrying a
  * malformed batch 50× per partition would amplify a client bug into a
  * server flood). The HttpClient and ObjectMapper are per-JVM
  * `@transient lazy` — the closures ship to executors serializable-clean
  * and each executor builds its own client on first use.
  */
object HttpTransport {

  /** Serializable POST-with-retry core shared by both transports. */
  final class JsonPoster(val endpoint: String, timeoutMs: Long,
      maxRetries: Int, backoffMs: Long) extends Serializable {
    @transient private lazy val http: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    @transient private lazy val mapper = new ObjectMapper()

    def obj(): com.fasterxml.jackson.databind.node.ObjectNode =
      mapper.createObjectNode()

    def post(body: String): JsonNode = {
      var attempt = 0
      var last: String = ""
      while (attempt <= maxRetries) {
        val resp =
          try Right(http.send(HttpRequest.newBuilder(URI.create(endpoint))
            .timeout(Duration.ofMillis(timeoutMs))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
            HttpResponse.BodyHandlers.ofString()))
          catch { case e: java.io.IOException => Left(e) }
        resp match {
          case Right(r) if r.statusCode() / 100 == 2 =>
            return mapper.readTree(r.body())
          case Right(r) if r.statusCode() / 100 == 4 =>
            throw new RuntimeException(
              s"HTTP ${r.statusCode()} from $endpoint (not retryable): " +
                r.body())
          case Right(r) => last = s"HTTP ${r.statusCode()}: ${r.body()}"
          case Left(e) => last = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
        if (attempt < maxRetries)
          Thread.sleep(backoffMs * (1L << math.min(attempt, 6)))
        attempt += 1
      }
      throw new RuntimeException(
        s"$endpoint failed after ${maxRetries + 1} attempts; last: $last")
    }
  }

  /** Batched HTTP embedder for [[EmbeddingTransformer]]: one POST per
    * batch of texts (the operator already groups rows into `batchSize`
    * batches and splits out nulls). Validates count and dimensionality —
    * a short or mis-shaped response must fail loudly, never misalign. */
  def embedder(endpoint: String, dim: Int, timeoutMs: Long = 30000,
      maxRetries: Int = 3,
      backoffMs: Long = 50): Seq[String] => Seq[Array[Float]] = {
    val poster = new JsonPoster(endpoint, timeoutMs, maxRetries, backoffMs)
    (texts: Seq[String]) => {
      val root = poster.obj()
      val arr = root.putArray("inputs")
      texts.foreach(arr.add)
      val embs = poster.post(root.toString).get("embeddings")
      require(embs != null && embs.isArray && embs.size == texts.size,
        s"embed endpoint returned ${if (embs == null) "no" else embs.size}" +
          s" embeddings for ${texts.size} inputs")
      (0 until embs.size).map { i =>
        val v = embs.get(i)
        require(v.isArray && v.size == dim,
          s"embedding $i has ${v.size} dims, expected $dim")
        Array.tabulate(dim)(j => v.get(j).floatValue())
      }
    }
  }

  /** Per-row HTTP predict call for [[RowPredictor]]: the operator's
    * partition-local thread pool (`concurrency` workers) provides the
    * bounded parallelism; each worker thread issues one synchronous
    * POST at a time — the distributed analog of the reference's
    * semaphore-of-50 async client (dspymator.py:394-417). */
  def predictFn(endpoint: String, timeoutMs: Long = 30000,
      maxRetries: Int = 3, backoffMs: Long = 50)
      : Map[String, String] => Map[String, String] = {
    val poster = new JsonPoster(endpoint, timeoutMs, maxRetries, backoffMs)
    (kwargs: Map[String, String]) => {
      val root = poster.obj()
      val kw = root.putObject("kwargs")
      kwargs.foreach { case (k, v) => kw.put(k, v) }
      val fields = poster.post(root.toString).get("fields")
      require(fields != null && fields.isObject,
        "predict endpoint returned no 'fields' object")
      val it = fields.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }
  }
}
