package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashEmbedder, PrimedEmbedder}
import graft.rag.Rag
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_sources")
    def w(name: String, bytes: Array[Byte]): Unit =
      Files.write(d.resolve(name), bytes)
    w("story.txt", "once upon a time a robot woke".getBytes("UTF-8"))
    // reference convention: sidecar is <full filename>.meta.yml
    // (reference src/lib/documents.py:95)
    w("story.txt.meta.yml",
      ("author: Asimov\ntitle: \"Waking\" # comment\n" +
        "subtitle: \"C# robots\"\npublication_date: 1956\n")
        .getBytes("UTF-8"))
    w("doc.md", "# heading\nbody text".getBytes("UTF-8"))
    w("page.html",
      ("<html><head><title>skip me</title>" +
        "<script>var tracking = 1;</script></head>" +
        "<body><h1>Crawl &amp; Clean</h1>" +
        "<p>visible body text</p></body></html>").getBytes("UTF-8"))
    w("book.epub", ("PKfakezipcontent").getBytes("ISO-8859-1"))
    w("paper.pdf", "%PDF-1.4 fake".getBytes("ISO-8859-1"))
    w("pic.png",
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 1, 2, 3))
    d.toString
  }

  test("S1/S2: magic-byte MIME identification + dispatch") {
    val scanned = Sources.ingestionReadyScan(spark, dir)
    val byName = scanned.collect()
      .map(r => Paths.get(r.getAs[String]("path").stripPrefix("file:"))
        .getFileName.toString ->
        (r.getAs[String]("mime"), r.getAs[String]("action"),
          Option(r.getAs[String]("text"))))
      .toMap
    assert(byName("story.txt")._1 == "text/plain")
    assert(byName("story.txt")._2 == "ingest")
    assert(byName("story.txt")._3.get.contains("robot woke"))
    assert(byName("doc.md")._1 == "text/markdown")
    assert(byName("book.epub")._1 == "application/epub+zip")
    assert(byName("book.epub")._2 == "convert")
    assert(byName("paper.pdf")._1 == "application/pdf")
    assert(byName("pic.png")._1 == "image/png")
    assert(byName("pic.png")._2 == "media")
    assert(byName("pic.png")._3.isEmpty)
  }

  test("S6: sidecar yaml metadata joins onto the matching file") {
    val scanned = Sources.ingestionReadyScan(spark, dir)
    val withMeta = Sources.withSidecarMetadata(scanned, spark, dir)
    val story = withMeta.filter(col("path").endsWith("story.txt")).head()
    val meta = story.getAs[Map[String, String]]("metadata")
    assert(meta == Map(
      "author" -> "Asimov", "title" -> "Waking",
      "subtitle" -> "C# robots", "publication_date" -> "1956"))
    val md = withMeta.filter(col("path").endsWith("doc.md")).head()
    assert(md.isNullAt(md.fieldIndex("metadata")))
    // sidecars themselves are not rows
    assert(withMeta.filter(col("path").endsWith(".meta.yml")).count() == 0)
  }

  test("yaml subset parser edges") {
    assert(Sources.parseFlatYaml("") == Map.empty)
    assert(Sources.parseFlatYaml("# only comment\n\n") == Map.empty)
    assert(Sources.parseFlatYaml("url: http://x/y:8?z") ==
      Map("url" -> "http://x/y:8?z"))
    assert(Sources.parseFlatYaml("k: 'v' # c") == Map("k" -> "v"))
  }

  test("E1: primed embedder is deterministic and differs from base") {
    val base = HashEmbedder(64)
    val primed = PrimedEmbedder(base, Rag.StubGenerator)
    val t = "robots dream of electric sheep"
    assert(primed.embed(t).sameElements(primed.embed(t)))
    assert(!primed.embed(t).sameElements(base.embed(t)))
    assert(primed.dim == 64)
  }

  test("sql extension functions usable from spark.sql") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT cosine_similarity(a, b) c, dot_product(a, b) d, l2_norm(a) n FROM v")
      .head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }

  test("EPUB format: zip+xhtml to clean text, promoted to ingest") {
    // build a tiny epub (zip of xhtml) fixture
    val d = Files.createTempDirectory("graft_epub")
    val epub = d.resolve("tale.epub")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(epub))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("mimetype", "application/epub+zip")
    entry("META-INF/container.xml", "<container/>")
    entry("OEBPS/ch1.xhtml",
      """<html><head><style>p{}</style><title>x</title></head>
        |<body><h1>Chapter &amp; One</h1>
        |<p>the robot &#x2014; a &quot;friend&quot; &mdash; awoke</p></body></html>"""
        .stripMargin)
    entry("OEBPS/ch2.xhtml", "<html><body><p>it dreamed of sheep</p></body></html>")
    entry("OEBPS/cover.jpg", "notanimage")
    zos.close()
    Files.write(d.resolve("tale.epub.meta.yml"),
      "author: Test Author\ntitle: Tale\n".getBytes("UTF-8"))

    val text = Sources.EpubFormat.toText(Files.readAllBytes(epub))
    assert(text == "Chapter & One the robot — a \"friend\" — awoke\n\nit dreamed of sheep")

    // scan with the full registry: epub becomes ingest, sidecar joins,
    // and the text feeds chunking
    val scanned = Sources.withSidecarMetadata(
      Sources.ingestionReadyScan(spark, d.toString, Sources.AllFormats),
      spark, d.toString)
    val row = scanned.filter(col("path").endsWith("tale.epub")).head()
    assert(row.getAs[String]("mime") == "application/epub+zip")
    assert(row.getAs[String]("action") == "ingest")
    assert(row.getAs[String]("text").contains("robot"))
    assert(row.getAs[Map[String, String]]("metadata")("author") == "Test Author")
    val chunks = Rag.buildChunks(
      scanned.filter(col("action") === "ingest")
        .select(lit(1L).as("doc_id"), col("text")),
      modelId = 1L, maxTokens = 4, dim = 16)
    assert(chunks.count() >= 2)
  }

  test("reference examples dir ingests end-to-end (epubs + sidecars)") {
    val refDir = "/root/reference/examples"
    assume(Files.isDirectory(Paths.get(refDir)), "reference examples absent")
    val scanned = Sources.withSidecarMetadata(
      Sources.ingestionReadyScan(spark, refDir, Sources.AllFormats),
      spark, refDir)
    val epubs = scanned.filter(col("mime") === "application/epub+zip")
    assert(epubs.count() == 5)
    assert(epubs.filter(col("action") =!= "ingest").count() == 0)
    // every epub extracted real text and carries its sidecar metadata
    val rows = epubs.select(
      col("path"), length(col("text")).as("n"),
      col("metadata")("author").as("author")).collect()
    assert(rows.forall(_.getAs[Int]("n") > 1000),
      "epub text extraction should produce substantial text")
    assert(rows.forall(r => r.getAs[String]("author") != null))
  }

  test("standalone .html ingests STRIPPED with line structure") {
    val scanned = Sources.ingestionReadyScan(spark, dir)
    val row = scanned.filter(col("path").endsWith("page.html")).head()
    assert(row.getAs[String]("mime") == "text/html")
    assert(row.getAs[String]("action") == "ingest")
    // head/script subtrees dropped, tags stripped, entities decoded,
    // and BLOCK boundaries become newlines (the line-level cleaning
    // family keys on them); a raw passthrough would leak "<html>"
    // and "var tracking" into the token stream
    assert(row.getAs[String]("text") == "Crawl & Clean\nvisible body text")
  }

  test("htmlToLines: blocks make lines, source newlines are inline ws") {
    assert(Sources.htmlToLines(
      "<p>foo\nbar</p><p>baz</p><div>qux<br>quux</div>") ==
      "foo bar\nbaz\nqux\nquux")
    // blank paragraphs collapse away
    assert(Sources.htmlToLines("<p> </p><p>a</p><p></p><p>b</p>") == "a\nb")
  }

  test("malformed crawl HTML: unclosed script/style/head cannot leak") {
    // truncated capture: script never closes -> dropped to EOF
    assert(Sources.htmlToText(
      "<p>keep me</p><script>var tracking = 1; trackUser(") == "keep me")
    // spec-valid head without </head>: ends where <body> starts
    assert(Sources.htmlToText(
      "<html><head><title>skip</title><body><p>kept body</p>") == "kept body")
    assert(Sources.htmlToLines(
      "<p>a</p><style>.x{color:red") == "a")
  }

  test("entity decoding: named, decimal, hex; unknown and bare pass through") {
    assert(Sources.decodeEntities("abc & def < g") == "abc & def < g")
    assert(Sources.decodeEntities("&#65;&#x42;&amp;&lt;&rsquo;") == "AB&<’")
    assert(Sources.decodeEntities("&bogus; &#xZZ;") == "&bogus; &#xZZ;")
    assert(Sources.htmlToText("<p>a<br/>b</p> <b>c</b>") == "a b c")
  }

  test("corrupt pseudo-epub yields null text, not a failed job") {
    val scanned = Sources.ingestionReadyScan(spark, dir, Sources.AllFormats)
    val fake = scanned.filter(col("path").endsWith("book.epub")).head()
    // book.epub is "PK"-prefixed garbage: promoted to ingest by the
    // registry but the converter fails safely per-row
    assert(fake.getAs[String]("action") == "ingest")
    assert(fake.isNullAt(fake.fieldIndex("text")))
  }

  test("ingestion scan feeds the import pipeline end-to-end") {
    val scanned = Sources.ingestionReadyScan(spark, dir)
      .filter(col("action") === "ingest")
      .withColumn("doc_id",
        abs(xxhash64(col("path"))) % 1000000)
    val chunks = Rag.buildChunks(
      scanned.select("doc_id", "text"), modelId = 1L, maxTokens = 16, dim = 32)
    assert(chunks.count() >= 2)
    assert(chunks.columns.contains("embedding"))
  }
}
