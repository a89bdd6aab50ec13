package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper

import graft.rag.Rag.TextGenerator

/** HTTP-backed implementations of the two LLM seams ([[Embedder]],
  * [[graft.rag.Rag.TextGenerator]]) — the pluggable service path the
  * deterministic stubs stand in for. The reference runs these stages
  * against an in-process vLLM model (reference `src/lib/llms.py:14-30`,
  * `src/lib/embedding.py:27-55`); at cluster scale the model lives
  * behind a service, so the engine's seam is a plain-JSON HTTP
  * protocol — the shape any self-hosted embedding/generation server
  * exposes (public knowledge; no vendor specifics):
  *
  *   POST <endpoint>/embed
  *     {"model": "m", "texts": ["...", ...]}
  *       -> {"embeddings": [[0.1, ...], ...]}   (one array per text)
  *   POST <endpoint>/generate
  *     {"model": "m", "prompt": "...", "max_tokens": 50, "temperature": 0.0}
  *       -> {"text": "..."}
  *
  * Scale stances:
  *  - the hot path is BATCHED: [[Embedders.embedDocuments]] runs one
  *    request per `batchSize` rows per partition (mapPartitions +
  *    grouped — the same batch shape as the multimodal decoder), never
  *    one request per row;
  *  - transient faults retry with exponential backoff (5xx and
  *    connect/read failures are retryable; 4xx means the request
  *    itself is wrong and fails fast);
  *  - both timeouts are explicit — a hung service fails the task
  *    rather than wedging an executor slot forever.
  *
  * The deterministic stubs remain the library default; these classes
  * are opt-in wiring for a real endpoint, e2e-tested against an
  * in-process double (HttpLlmSpec).
  */
object HttpJson {

  /** POST `body` as JSON, return the response bytes. Retries
    * connect/read IOExceptions and 5xx responses `maxRetries` times
    * with exponential backoff (backoffMs, 2x per attempt); 4xx throws
    * immediately — re-sending an invalid request cannot succeed. */
  def post(
      url: String, body: Array[Byte], connectTimeoutMs: Int,
      readTimeoutMs: Int, maxRetries: Int, backoffMs: Long): Array[Byte] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try {
        val conn = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/json")
          val os = conn.getOutputStream
          try os.write(body) finally os.close()
          val code = conn.getResponseCode
          if (code >= 200 && code < 300) return readAll(conn.getInputStream)
          else if (code >= 500)
            throw new java.io.IOException(s"HTTP $code from $url")
          else {
            val detail = Option(conn.getErrorStream)
              .map(s => new String(readAll(s), "UTF-8")).getOrElse("")
            throw new IllegalArgumentException(
              s"HTTP $code from $url (not retryable): $detail")
          }
        } finally conn.disconnect()
      } catch {
        case e: java.io.IOException =>
          lastErr = e
          attempt += 1
          if (attempt <= maxRetries) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new java.io.IOException(
      s"POST $url failed after ${maxRetries + 1} attempts", lastErr)
  }

  private def readAll(in: java.io.InputStream): Array[Byte] =
    try in.readAllBytes() finally in.close()
}

/** Embedder backed by an HTTP embedding service. One request per
  * [[Embedder.embedBatch]] call — pair with
  * [[Embedders.embedDocuments]] so executors amortize a request over
  * `batchSize` rows. Config-only fields: serializable by construction,
  * connections are opened per call on the executor. */
case class HttpEmbedder(
    endpoint: String,
    model: String,
    dim: Int,
    connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 30000,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 200L) extends Embedder {

  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("texts")
    texts.foreach(arr.add)
    val resp = HttpJson.post(s"$endpoint/embed", m.writeValueAsBytes(root),
      connectTimeoutMs, readTimeoutMs, maxRetries, retryBackoffMs)
    val embs = m.readTree(resp).get("embeddings")
    require(embs != null && embs.size == texts.size,
      s"embed response has ${if (embs == null) "no" else embs.size} " +
        s"embeddings for ${texts.size} texts")
    (0 until embs.size).map { i =>
      val e = embs.get(i)
      if (e == null || e.isNull) null
      else {
        require(e.size == dim,
          s"service returned dim ${e.size}, expected $dim")
        Array.tabulate(e.size)(j => e.get(j).floatValue())
      }
    }
  }
}

/** TextGenerator backed by an HTTP generation service (G5 / E1's
  * priming call). Generation is driver-side or low-volume in this
  * engine (one call per prompt), so there is no batch form. */
case class HttpTextGenerator(
    endpoint: String,
    model: String = "default",
    connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 60000,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 200L) extends TextGenerator {

  def generate(prompt: String, maxTokens: Int, temperature: Double): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("model", model)
    root.put("prompt", prompt)
    root.put("max_tokens", maxTokens)
    root.put("temperature", temperature)
    val resp = HttpJson.post(s"$endpoint/generate", m.writeValueAsBytes(root),
      connectTimeoutMs, readTimeoutMs, maxRetries, retryBackoffMs)
    val text = m.readTree(resp).get("text")
    require(text != null && !text.isNull, "generate response has no 'text'")
    text.asText()
  }
}

/** Distributed embedding through a pluggable [[Embedder]]. */
object Embedders {

  /** Append `outCol` (array<float>) to `df` by embedding `textCol` in
    * per-partition batches: mapPartitions + grouped(batchSize), ONE
    * `embedBatch` call per group — a narrow map stage, no shuffle.
    * Null texts get null embeddings without touching the embedder.
    * This is the service-embedder hot path; the expression-based
    * [[Embedding.embedColumn]] remains the right form for the
    * in-process deterministic embedder (codegen, no row boxing). */
  def embedDocuments(
      df: org.apache.spark.sql.DataFrame, textCol: String, outCol: String,
      embedder: Embedder, batchSize: Int = 32): org.apache.spark.sql.DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = df.sparkSession
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false),
      nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    val rows = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rs =>
        val texts = rs.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val nonNull = texts.filter(_ != null)
        val embedded = embedder.embedBatch(nonNull).iterator
        rs.zip(texts).map { case (r, t) =>
          val e = if (t == null) null else embedded.next()
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ (if (e == null) null else e.toSeq))
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
