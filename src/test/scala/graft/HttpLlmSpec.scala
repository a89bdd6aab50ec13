package graft

import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embedding, Embedders, HashEmbedder, HttpEmbedder, HttpTextGenerator}
import graft.rag.Rag

/** E2E coverage of the HTTP LLM seam against an in-process double: a
  * JDK HttpServer speaking the plain-JSON embed/generate protocol,
  * deterministic (hash embedder + stub digest) so results compare
  * bit-equal with the in-process path, with a controllable failure
  * budget to exercise the retry path. */
class HttpLlmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val Dim = 64

  /** Start the double. Returns (server, endpoint, embedRequests,
    * failuresRemaining): while failuresRemaining > 0 every request is
    * answered 500 (and the counter decremented). */
  private def startDouble(): (HttpServer, String, AtomicInteger, AtomicInteger) = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val embedRequests = new AtomicInteger(0)
    val failuresRemaining = new AtomicInteger(0)
    val mapper = new ObjectMapper()
    def respond(ex: HttpExchange)(body: => Array[Byte]): Unit = {
      if (failuresRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(500, -1)
        ex.close()
      } else {
        val bytes = body
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    }
    server.createContext("/embed", (ex: HttpExchange) => respond(ex) {
      embedRequests.incrementAndGet()
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val texts = req.get("texts")
      val root = mapper.createObjectNode()
      val out = root.putArray("embeddings")
      (0 until texts.size).foreach { i =>
        val arr = out.addArray()
        Embedding.embed(texts.get(i).asText(), Dim).foreach(arr.add)
      }
      mapper.writeValueAsBytes(root)
    })
    server.createContext("/generate", (ex: HttpExchange) => respond(ex) {
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val root = mapper.createObjectNode()
      root.put("text",
        Rag.StubGenerator.generate(req.get("prompt").asText(),
          req.get("max_tokens").asInt, req.get("temperature").asDouble))
      mapper.writeValueAsBytes(root)
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}",
      embedRequests, failuresRemaining)
  }

  test("HTTP embedder ≡ in-process hash embedder; one request per batch") {
    val (server, endpoint, embedRequests, _) = startDouble()
    try {
      val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text").limit(100).coalesce(1)
      val http = HttpEmbedder(endpoint, "test-model", Dim)
      val got = Embedders.embedDocuments(docs, "text", "embedding", http,
          batchSize = 32)
        .select(col("doc_id"), col("embedding"))
      val expected = docs.select(col("doc_id"),
        Embedding.embedColumn(col("text"), Dim).as("embedding"))
      assert(got.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
        == expected.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap)
      // 100 rows in one partition at batchSize 32 → exactly 4 requests
      assert(embedRequests.get == 4,
        s"expected 4 batched requests, saw ${embedRequests.get}")
    } finally server.stop(0)
  }

  test("import via HTTP embedder ≡ buildChunks; generation through the double") {
    val (server, endpoint, _, _) = startDouble()
    try {
      val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text").limit(50)
      val viaHttp = Rag.buildChunksWith(docs, modelId = 1L,
          HttpEmbedder(endpoint, "test-model", Dim), maxTokens = 32,
          batchSize = 16)
        .select("id", "chunk_text", "embedding")
      val inProcess = Rag.buildChunks(docs, modelId = 1L, maxTokens = 32,
          dim = Dim)
        .select("id", "chunk_text", "embedding")
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getSeq[Float](2)))).toMap
      assert(keyed(viaHttp) == keyed(inProcess))

      // G5 through the service seam: same digest as the local stub
      val gen = HttpTextGenerator(endpoint)
      val prompt = "Context: a robot story.\nQuestion: are robots friendly?"
      assert(gen.generate(prompt, 50, 0.0)
        == Rag.StubGenerator.generate(prompt, 50, 0.0))
    } finally server.stop(0)
  }

  test("CLI --embedder/--generator: service-backed import + search ≡ stub store") {
    val (server, endpoint, embedRequests, _) = startDouble()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cli_http").toString
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text").limit(40)
        .write.parquet(s"$tmp/docs")
      // the CLI surface end-to-end, once through the service seam and
      // once through the default stub
      graft.cli.Demo.run(spark, "import", Map(
        "docs" -> s"$tmp/docs", "store" -> s"$tmp/http_store",
        "model" -> "spec-model", "dim" -> Dim.toString,
        "max-tokens" -> "32", "embedder" -> endpoint))
      assert(embedRequests.get > 0, "import never called the service")
      graft.cli.Demo.run(spark, "import", Map(
        "docs" -> s"$tmp/docs", "store" -> s"$tmp/stub_store",
        "model" -> "spec-model", "dim" -> Dim.toString,
        "max-tokens" -> "32"))
      // the double serves the deterministic hash embedding, so the two
      // stores must agree chunk-for-chunk including embeddings
      def keyed(store: String) =
        spark.read.parquet(s"$store/chunks")
          .select("id", "chunk_text", "embedding").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Float](2))))
          .toMap
      assert(keyed(s"$tmp/http_store") == keyed(s"$tmp/stub_store"))
      // query-side: search through the service embedder ≡ stub search
      def hits(store: String, emb: Option[graft.functions.Embedder]) =
        graft.cli.Demo.search(spark, store, "robots in the red desert",
            topK = 5, threshold = -1.0, dim = Dim, ann = "exact",
            embedder = emb)
          .select("id").collect().map(_.getLong(0)).toSeq
      assert(hits(s"$tmp/http_store",
          Some(HttpEmbedder(endpoint, "spec-model", Dim)))
        == hits(s"$tmp/stub_store", None))
      // a non-URL --embedder fails loudly, not silently as the stub
      val e = intercept[IllegalArgumentException] {
        graft.cli.Demo.run(spark, "import", Map(
          "docs" -> s"$tmp/docs", "store" -> s"$tmp/x",
          "embedder" -> "not-a-url"))
      }
      assert(e.getMessage.contains("http(s) service URL"))
    } finally server.stop(0)
  }

  test("E1 priming composes over the HTTP generator: primed ≡ stub-primed") {
    val (server, endpoint, _, _) = startDouble()
    try {
      val viaHttp = graft.functions.PrimedEmbedder(
        HashEmbedder(Dim), HttpTextGenerator(endpoint))
      val local = graft.functions.PrimedEmbedder(
        HashEmbedder(Dim), Rag.StubGenerator)
      val text = "robots walk the red desert"
      assert(viaHttp.embed(text).toSeq == local.embed(text).toSeq)
    } finally server.stop(0)
  }

  test("transient 5xx retries to success; dead endpoint fails loudly") {
    val (server, endpoint, embedRequests, failuresRemaining) = startDouble()
    try {
      failuresRemaining.set(2)
      val http = HttpEmbedder(endpoint, "m", Dim,
        maxRetries = 3, retryBackoffMs = 10L)
      val e = http.embed("hello world")
      assert(e.toSeq == HashEmbedder(Dim).embed("hello world").toSeq)
      // 2 failed + 1 successful attempt, all counted server-side
      assert(embedRequests.get == 1,
        "failure responses must not count as served embed requests")
      failuresRemaining.set(10) // exhausts maxRetries=1
      val dead = HttpEmbedder(endpoint, "m", Dim,
        maxRetries = 1, retryBackoffMs = 10L)
      intercept[java.io.IOException] { dead.embed("x") }
    } finally server.stop(0)
  }
}
