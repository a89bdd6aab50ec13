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

  /** Default formats: utf-8 passthrough for plain text; Markdown goes
    * through [[markdownToText]] (round 13 — the reference's pipeline
    * converts EPUB→pandoc MARKDOWN before chunking, so .md is the
    * intermediate format its users already hold; ingesting it raw
    * would push header/emphasis/link markup straight into the token
    * stream);
    * standalone HTML goes through the SAME markup stripper the EPUB
    * converter uses. */
  val TextFormats: Seq[SourceFormat] = Seq(
    new SourceFormat {
      val mime: String = "text/plain"
      def toText(content: Array[Byte]): String = new String(content, "UTF-8")
    },
    new SourceFormat {
      val mime: String = "text/markdown"
      def toText(content: Array[Byte]): String =
        markdownToText(new String(content, "UTF-8"))
    },
    new SourceFormat {
      val mime: String = "text/html"
      def toText(content: Array[Byte]): String =
        htmlToLines(new String(content, "UTF-8"))
    })

  /** Markdown → prose text (line-structured, like [[htmlToLines]]):
    * strips the markup a pandoc-produced document carries while
    * keeping every word of prose. Deliberately CONSERVATIVE — an
    * over-eager stripper that eats `snake_case` or math is worse than
    * a leftover asterisk:
    *  - fenced code blocks (``` / ~~~): fence lines drop, contents
    *    pass through VERBATIM (no marker stripping inside — code is
    *    content, pandoc's plain writer keeps it too);
    *  - ATX headers: leading `#`s + trailing closing `#`s strip;
    *  - setext underlines / thematic breaks (`===`, `---`, `***`
    *    lines) drop — the header text line above already carries the
    *    words;
    *  - blockquote `>` markers and list bullets/numbers strip at line
    *    start;
    *  - images `![alt](url)` keep the alt, links `[text](url)` /
    *    `[text][ref]` keep the text, autolinks `<http://x>` keep the
    *    url;
    *  - inline code backticks strip (content kept);
    *  - `*`/`**` emphasis markers strip; `_` strips ONLY when it
    *    wraps a word (`\b_x_\b`) so identifiers like `snake_case`
    *    survive. */
  def markdownToText(md: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inFence = false
    var fenceChar = ' '
    var fenceLen = 0
    for (line <- md.replace("\r\n", "\n").split("\n", -1)) {
      val t = line.trim
      // CommonMark fences: open on a run of >= 3 backticks/tildes
      // (info string allowed); close ONLY on a bare run of the same
      // char, length >= 3 AND >= the opening run (round-14 advisor: a
      // lone '`' line inside a block — docs about markdown — must not
      // end the fence early)
      val runChar = if (t.nonEmpty) t.head else ' '
      val run = if (runChar == '`' || runChar == '~')
        t.takeWhile(_ == runChar).length else 0
      if (!inFence && run >= 3) {
        inFence = true; fenceChar = runChar; fenceLen = run
      }
      else if (inFence && runChar == fenceChar && run >= 3 &&
          run >= fenceLen && t.forall(_ == fenceChar)) inFence = false
      else if (inFence) out += line
      else if (t.matches("(=+|-{3,}|\\*{3,}|_{3,})\\s*")) () // rule/underline
      else {
        var s = line
        s = s.replaceAll("^\\s{0,3}#{1,6}\\s+", "")   // ATX header open
          .replaceAll("\\s+#+\\s*$", "")              // ATX closing #s
          .replaceAll("^\\s{0,3}(>\\s?)+", "")        // blockquotes
          .replaceAll("^\\s*([-*+]|\\d{1,3}\\.)\\s+", "") // list markers
        s = s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // images
          .replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")     // inline links
          .replaceAll("\\[([^\\]]+)\\]\\[[^\\]]*\\]", "$1")   // ref links
          .replaceAll("<(https?://[^>\\s]+)>", "$1")          // autolinks
          .replace("`", "")                                    // inline code
          // emphasis: strip only emphasis-SHAPED *runs* (opening run
          // hugging non-space content up to a closing run) — a bare
          // multiplication '2 * 3' or glob 'SELECT *' has no closing
          // run and survives (round-14 advisor: the conservative
          // contract the _word_ rule already follows)
          .replaceAll("\\*{1,3}(\\S[^*]*?)\\*{1,3}", "$1")     // *em*/**b**
          .replaceAll("\\b_([^_\\s][^_]*)_\\b", "$1")          // _word_
        out += s
      }
    }
    out.mkString("\n").replaceAll("\n{3,}", "\n\n").trim
  }

  /** S3 in-engine: pure-JVM EPUB→text. An EPUB is a zip of XHTML
    * content documents (plus css/images/opf bookkeeping); extraction =
    * unzip, keep the markup documents, strip tags/entities, join in
    * entry-name order (parsing the OPF spine for exact reading order
    * is a refinement — Gutenberg-style epubs name content files in
    * order). Replaces the reference's pandoc subprocess
    * (reference `src/lib/sources.py:64-112`) with a dependency-free
    * converter that runs inside the distributed scan. */
  val EpubFormat: SourceFormat = new SourceFormat {
    val mime: String = "application/epub+zip"
    def toText(content: Array[Byte]): String = {
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(content))
      val docs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        if (!e.isDirectory && !name.startsWith("META-INF/") &&
            (name.endsWith(".xhtml") || name.endsWith(".html") ||
              name.endsWith(".htm")))
          docs += name -> new String(zis.readAllBytes(), "UTF-8")
        e = zis.getNextEntry
      }
      // a zip with no markup documents is not a readable epub (garbage
      // that merely starts with "PK" lands here) — fail the row so the
      // scan's per-row Try yields null text instead of empty text
      require(docs.nonEmpty, "no xhtml content documents in epub")
      docs.sortBy(_._1).map(d => htmlToText(d._2))
        .filter(_.nonEmpty).mkString("\n\n")
    }
  }

  /** Every built-in format including the EPUB converter — the registry
    * the CLI scan/import paths use. */
  val AllFormats: Seq[SourceFormat] = TextFormats :+ EpubFormat

  /** Drop the non-content subtrees, tolerating MALFORMED crawl HTML:
    * comments go first (a commented-out `<script>` must not trigger
    * the fallbacks below — advisor, round 12; an unclosed `<!--`
    * comments out the rest of the page per the parsing spec, exactly
    * as a browser renders it), then properly closed head/script/style
    * pairs; an UNCLOSED `<head>` is dropped up to the first `<body`
    * (the HTML spec makes `</head>` optional — head implicitly ends
    * where body content starts), and an unclosed `<script>`/`<style>`
    * — common in truncated crawl captures — is dropped to
    * end-of-input, so a missing closer can't leak scripts into the
    * token stream. The unclosed-tag fallback requires a real
    * tag-open shape (`<script` followed by whitespace or `>`): a bare
    * "<script" in prose no longer truncates the page tail. */
  private def dropNonContent(html: String): String =
    html.replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll("(?s)<!--.*$", " ")
      .replaceAll("(?is)<head\\b.*?</head>", " ")
      .replaceAll("(?is)<head\\b.*?(?=<body\\b|$)", " ")
      .replaceAll("(?is)<(script|style)\\b.*?</\\1>", " ")
      .replaceAll("(?is)<(?:script|style)[\\s>].*$", " ")

  /** Markup → plain text: drop head/script/style subtrees, strip tags,
    * decode character entities, collapse whitespace to single spaces
    * (the chunker's token delimiter — the EPUB/RAG import shape; for
    * the line-granular cleaning family use [[htmlToLines]]). */
  def htmlToText(html: String): String = {
    val noTags = dropNonContent(html).replaceAll("(?s)<[^>]*>", " ")
    decodeEntities(noTags).replaceAll("\\s+", " ").trim
  }

  /** Block-level tags that end a text line when HTML is converted for
    * the line-granular cleaners. */
  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|table|blockquote|pre|section" +
      "|article|header|footer|figure|figcaption|main|aside|nav|form"

  /** Markup → newline-structured text: like [[htmlToText]] but block
    * boundaries (`<p>`, `</div>`, `<br>`, headings, list items, table
    * rows, …) become NEWLINES instead of spaces, so a crawled page
    * keeps the line/paragraph structure the line-level cleaning
    * family keys on (t45 C4 line rules, t46 intra-doc line dedup, d19
    * paragraph boilerplate — all split on \n; a space-flattened page
    * would be one giant line that t45 drops wholesale). Within a
    * line, whitespace collapses to single spaces; blank lines
    * collapse away. */
  def htmlToLines(html: String): String = {
    // source newlines are INLINE whitespace in HTML ("<p>foo\nbar</p>"
    // is one paragraph) — flatten them first; only markup makes lines
    val flat = dropNonContent(html).replaceAll("\\s+", " ")
    val blocks = flat
      .replaceAll("(?i)<br\\s*/?>", "\n")
      .replaceAll(s"(?i)</?(?:$BlockTags)\\b[^>]*>", "\n")
    val noTags = blocks.replaceAll("<[^>]*>", " ")
    decodeEntities(noTags)
      .split("\n", -1).iterator
      .map(_.replaceAll("\\s+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  private val EntityMap = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”")

  /** Decode named + numeric (decimal and hex) character entities;
    * unknown entities pass through unchanged. */
  def decodeEntities(s: String): String = {
    val m = java.util.regex.Pattern.compile("&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);")
      .matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val e = m.group(1)
      val rep =
        if (e.startsWith("#"))
          scala.util.Try {
            val cp =
              if (e.charAt(1) == 'x' || e.charAt(1) == 'X')
                Integer.parseInt(e.substring(2), 16)
              else Integer.parseInt(e.substring(1))
            new String(Character.toChars(cp))
          }.getOrElse(m.group(0))
        else EntityMap.getOrElse(e.toLowerCase, m.group(0))
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** S5: ingestion-ready scan — read a directory via the binaryFile
    * source, identify, dispatch, and decode the ingestable files to
    * text. One distributed pass; non-ingestable rows keep their
    * action tag for routing (convert queue / media path). */
  def ingestionReadyScan(
      spark: SparkSession, dir: String,
      formats: Seq[SourceFormat] = TextFormats): DataFrame = {
    val decoders = formats.map(f => f.mime -> f).toMap
    // a registered converter promotes its MIME to direct ingestion
    // (e.g. AllFormats turns the epub "convert" route into "ingest");
    // a corrupt file yields null text, never a failed job
    val decode = udf((mime: String, content: Array[Byte]) =>
      decoders.get(mime)
        .flatMap(f => scala.util.Try(f.toText(content)).toOption))
    val handled = decoders.keySet.toSeq
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
      .withColumn("mime", mimeOf(col("path"), col("content")))
      .withColumn("action",
        when(col("mime").isin(handled: _*), "ingest")
          .otherwise(ingestActionOf(col("mime"))))
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

  /** Image–caption extraction patterns (m14) — ONE definition for the
    * engine and the replay oracle (interpolated into its SQL), so the
    * two sides cannot drift. Group numbers: (url, caption). Plain
    * character-class regexes, no anchors/backrefs — identical
    * semantics under Java regex (engine) and RE2 (oracle); the
    * round-11 `$`-vs-`\z` divergence class cannot arise. */
  val MdImagePat = "!\\[([^\\]]*)\\]\\(([^)\\s]+)\\)"
  val ImgSrcAltPat = "<img[^>]*src=\"([^\"]*)\"[^>]*alt=\"([^\"]*)\""
  val ImgAltSrcPat = "<img[^>]*alt=\"([^\"]*)\"[^>]*src=\"([^\"]*)\""
  val FigurePat = "<figure>\\s*<img[^>]*src=\"([^\"]*)\"[^>]*>" +
    "\\s*<figcaption>([^<]*)</figcaption>"

  /** Image–caption PAIR extraction (m14 — the multimodal PAIRING rung:
    * the modality ladder dedups each modality but an (image, caption)
    * training pipeline needs them ASSOCIATED first). From a document
    * text column, emit one row per image reference carrying its
    * caption: markdown `![alt](url)` alt text, HTML `<img src alt>`
    * (both attribute orders), and `<figure><img><figcaption>` blocks.
    * Pure scan projection — regexp_extract_all per pattern, one
    * posexplode per kind, zero shuffles until the caller's output
    * sort; `pos` is the 0-based ordinal of the reference within its
    * (doc, kind). Scale shape: per-row work is linear in text length,
    * nothing leaves the map stage. */
  def imageCaptionPairs(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def ofKind(kind: String, pat: String, urlG: Int, capG: Int) =
      df.select(col(idCol).cast("long").as("doc_id"),
          regexp_extract_all(col(textCol), lit(pat), lit(urlG)).as("us"),
          regexp_extract_all(col(textCol), lit(pat), lit(capG)).as("cs"))
        .select(col("doc_id"),
          posexplode(arrays_zip(col("us"), col("cs"))).as(Seq("pos", "uc")))
        .select(col("doc_id"), lit(kind).as("kind"),
          col("pos").cast("int").as("pos"),
          col("uc.us").as("image_url"), col("uc.cs").as("caption"))
    ofKind("md", MdImagePat, 2, 1)
      .unionByName(ofKind("img", ImgSrcAltPat, 1, 2))
      .unionByName(ofKind("img_rev", ImgAltSrcPat, 2, 1))
      .unionByName(ofKind("figure", FigurePat, 1, 2))
  }
}
