package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source identification, conversion dispatch and ingestion-ready
  * scanning (SURVEY.md §2.1 S1/S2/S5/S6), Spark-first.
  *
  * The reference shells out to libmagic per file and converts EPUBs
  * via a pandoc subprocess (reference `src/lib/sources.py:12-22,
  * 64-172`). Here identification is a column expression over Spark's
  * `binaryFile` source — magic-byte sniffing on the content prefix
  * runs distributed, inside the scan, with no external binary.
  * Conversion itself (EPUB→Markdown) is a documented pre-step outside
  * the engine (SURVEY.md §7.4 decision 3); the dispatch table decides
  * per-file whether the engine ingests directly, and the pluggable
  * `SourceFormat` hook lets pure-JVM converters slot in.
  */
object Sources {

  /** S1: MIME identification from magic bytes (first bytes of
    * `content`) with extension fallback — the distributed stand-in for
    * libmagic. Covers the formats the reference's pipeline meets:
    * EPUB/ZIP, PDF, GZIP, PNG, JPEG, HTML, Markdown, plain text. */
  def mimeOf(path: Column, content: Column): Column = {
    def startsWithBytes(bytes: Array[Byte]): Column =
      substring(content, 1, bytes.length) === lit(bytes)
    when(startsWithBytes("PK\u0003\u0004".getBytes("ISO-8859-1")),
      // zip container: epub when the extension says so
      when(lower(path).endsWith(".epub"), "application/epub+zip")
        .otherwise("application/zip"))
      .when(startsWithBytes("%PDF".getBytes("ISO-8859-1")), "application/pdf")
      .when(startsWithBytes(Array(0x1f.toByte, 0x8b.toByte)), "application/gzip")
      .when(startsWithBytes(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        "image/png")
      .when(startsWithBytes(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)),
        "image/jpeg")
      .when(lower(path).endsWith(".html") || lower(path).endsWith(".htm"),
        "text/html")
      .when(lower(path).endsWith(".md") || lower(path).endsWith(".markdown"),
        "text/markdown")
      .otherwise("text/plain")
  }

  /** S2: conversion dispatch — which MIME types the engine ingests
    * as-is, which need an out-of-engine converter, which are opaque
    * media (multimodal path). Mirrors `SourceConverter.needs_conversion
    * / is_convertible` (reference `src/lib/sources.py:184-216`). */
  val DirectlyIngestable: Seq[String] =
    Seq("text/plain", "text/markdown", "text/html")
  val ConvertibleUpstream: Seq[String] =
    Seq("application/epub+zip", "application/pdf")

  def ingestActionOf(mime: Column): Column =
    when(mime.isin(DirectlyIngestable: _*), "ingest")
      .when(mime.isin(ConvertibleUpstream: _*), "convert")
      .when(mime.startsWith("image/") || mime.startsWith("audio/") ||
        mime.startsWith("video/"), "media")
      .otherwise("skip")

  /** Pluggable pure-JVM converter hook (S2's converter classes). */
  trait SourceFormat extends Serializable {
    def mime: String
    def toText(content: Array[Byte]): String
  }

  /** Default formats: utf-8 passthrough for the text family. */
  val TextFormats: Seq[SourceFormat] = Seq("text/plain", "text/markdown", "text/html")
    .map { m =>
      new SourceFormat {
        val mime: String = m
        def toText(content: Array[Byte]): String = new String(content, "UTF-8")
      }
    }

  /** S5: ingestion-ready scan — read a directory via the binaryFile
    * source, identify, dispatch, and decode the ingestable files to
    * text. One distributed pass; non-ingestable rows keep their
    * action tag for routing (convert queue / media path). */
  def ingestionReadyScan(
      spark: SparkSession, dir: String,
      formats: Seq[SourceFormat] = TextFormats): DataFrame = {
    val decoders = formats.map(f => f.mime -> f).toMap
    val decode = udf((mime: String, content: Array[Byte]) =>
      decoders.get(mime).map(_.toText(content)))
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
      .withColumn("mime", mimeOf(col("path"), col("content")))
      .withColumn("action", ingestActionOf(col("mime")))
      .withColumn("text",
        when(col("action") === "ingest", decode(col("mime"), col("content"))))
      .drop("content")
  }

  // -------------------------------------------------------------
  // S6: sidecar metadata (<file>.meta.yml)
  // -------------------------------------------------------------

  /** Minimal YAML-subset parser for the reference's sidecar files
    * (flat `key: value` pairs, comments, quoted strings — the only
    * shapes in the reference's examples dir sidecars). No external
    * dependency. Comment stripping is quote-aware so values like
    * `"C# primer"` survive. */
  def parseFlatYaml(text: String): Map[String, String] =
    text.linesIterator
      .map(stripComment)
      .map(_.trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val Array(k, v @ _*) = l.split(":", 2): @unchecked
        k.trim -> v.mkString(":").trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'")
      }
      .toMap

  /** Drop an unquoted trailing `# comment`; `#` inside single or
    * double quotes is content. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  /** Join sidecar metadata onto the scanned sources: sidecars are tiny
    * — read them in the same binaryFile pass, parse to a map column,
    * and broadcast-join on the base path. The reference convention is
    * `<full filename>.meta.yml` beside the file (reference
    * `src/lib/documents.py:95`, e.g. `second-variety.epub.meta.yml`),
    * so the sidecar key is the path minus the `.meta.yml` suffix and
    * the data file's key is its full path. */
  def withSidecarMetadata(scanned: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val parse = udf((content: Array[Byte]) =>
      parseFlatYaml(new String(content, "UTF-8")))
    val sidecars = spark.read.format("binaryFile")
      .load(dir)
      .filter(col("path").endsWith(".meta.yml"))
      .select(
        regexp_replace(col("path"), "\\.meta\\.yml$", "").as("base_path"),
        parse(col("content")).as("metadata"))
    scanned
      .filter(!col("path").endsWith(".meta.yml"))
      .withColumn("base_path", col("path"))
      .join(broadcast(sidecars), Seq("base_path"), "left")
      .drop("base_path")
  }
}
