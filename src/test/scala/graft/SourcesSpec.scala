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
