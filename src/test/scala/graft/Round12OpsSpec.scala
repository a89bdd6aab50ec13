package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-12 operator specs: d21's decontamination NORMALIZATION
  * (casefold + punctuation strip, Brown et al. 2020 app. C), the
  * footer-only row count behind d11's derived nCells, and the
  * crawl-HTML fallback fixes. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("d21 normalization: re-cased/re-punctuated plant caught; raw grams miss") {
    val s = spark; import s.implicits._
    val benchWords = (1 to 20).map(i => s"benchword$i")
    val bench = Seq((0L, benchWords.mkString(" "))).toDF("doc_id", "text")
    val run = benchWords.slice(2, 15) // exactly 13 bench tokens
    // the escape route a raw-gram screen cannot see: every copied word
    // UPPERCASED and wrapped in quote+comma punctuation
    val mutated = run.map(w => "“" + w.toUpperCase + ",”").mkString(" ")
    val fill = (1 to 6).map(i => s"filler$i")
    val train = Seq(
      (1L, (fill :+ mutated).mkString(" ")),
      (2L, "clean doc of seven words entirely unrelated today")
    ).toDF("doc_id", "text")
    val out = Dedup.benchmarkContamination(train, bench, "doc_id", "text", 13)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, true)),
      "normalized screen must flag the re-cased/re-punctuated plant")
    assert(out(2L) == ((0L, false)))
    // the round-11 RAW-gram screen misses exactly this doc: none of the
    // mutated text's raw 13-grams exists in the raw bench gram set
    val rawBg = Dedup
      .gramStarts(Dedup.tokArrays(bench, "doc_id", "text"), 13)
      .select("g").distinct()
    val rawHits = Dedup
      .gramStarts(Dedup.tokArrays(train, "doc_id", "text"), 13)
      .join(rawBg, "g").count()
    assert(rawHits == 0, "raw 13-grams must NOT match the mutated plant")
    Caches.release(spark)
  }

  test("d21 normalization is identity on clean lowercase ASCII") {
    val s = spark; import s.implicits._
    val words = ('a' to 'z').map(c => s"word$c")
    val df = Seq((9L, words.mkString(" "))).toDF("doc_id", "text")
    val norm = df.select(Dedup.decontamTokens(col("text"))).head.getSeq[String](0)
    assert(norm == words, "no punct/case → normalization must be a no-op")
  }

  test("ParquetStats.rowCount: footer count == scan count, ZERO jobs") {
    val path = s"$sfDir/documents.parquet"
    val scanned = Tables.load(spark, sfDir, "documents").count()
    def countJobs(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      org.apache.spark.sql.GraftShim.flushListenerBus(spark)
      spark.sparkContext.addSparkListener(l)
      try { f; org.apache.spark.sql.GraftShim.flushListenerBus(spark) }
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    var viaFooter: Option[Long] = None
    val jobs = countJobs {
      viaFooter = graft.store.ParquetStats.rowCount(spark, path)
    }
    assert(viaFooter.contains(scanned))
    // the d11 contract: deriving nCells must not run a cluster job
    assert(jobs == 0, s"footer row count ran $jobs Spark jobs")
    assert(graft.store.ParquetStats.rowCount(spark, s"$sfDir/no_such").isEmpty)
  }

  test("m9 image dedup: planted fill-groups collapse to one kept rep") {
    val assets = graft.operators.PipelineQueries.m8PlantedAssets(spark, sfDir)
    val dec = graft.multimodal.Multimodal.imageDedup(assets, maxDist = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    Caches.release(spark)
    // every asset got a decision, kept ⟺ own rep
    assert(dec.size == assets.count())
    assert(dec.forall { case (id, (rep, kept)) => kept == (id == rep) })
    // each planted 7-group shares one image → one rep for the group
    val byFill = dec.keys.groupBy(id => id - id % 7)
    byFill.foreach { case (fid, ids) =>
      val reps = ids.map(id => dec(id)._1).toSet
      assert(reps.size == 1, s"fill group $fid split across reps $reps")
    }
    // exactly one kept member per representative
    dec.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.values.count(_._2) == 1,
        s"rep $rep cluster must keep exactly one member")
      assert(dec(rep)._2, s"the representative $rep itself must be kept")
    }
  }

  test("m9 streaming face: decision from folded pHash state == batch m9") {
    import graft.streaming.DedupStreams
    val assets = graft.operators.PipelineQueries.m8PlantedAssets(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_m9stream").toString
    assets.repartition(3).write.parquet(s"$tmp/src")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    DedupStreams.streamingPhashes(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val streamed = DedupStreams.imageDedupFromState(spark, s"$tmp/state")
    assert(streamed.isDefined, "no committed pHash state")
    val batch = SparkEntry.queries("m9_image_dedup")(spark, sfDir)
    assert(rows(streamed.get) == rows(batch))
    Caches.release(spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("t47 buckets are per-language terciles (each lang has all 3)") {
    val out = SparkEntry.queries("t47_perlang_perplexity")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getInt(5)))
    Caches.release(spark)
    val byLang = out.groupBy(_._1)
    assert(byLang.size >= 2, "corpus should carry several languages")
    byLang.foreach { case (lang, rows) =>
      val buckets = rows.map(_._2).toSet
      assert(buckets.subsetOf(Set(1, 2, 3)), s"$lang buckets: $buckets")
      // each language's docs are cut into terciles WITHIN the language
      if (rows.size >= 9)
        assert(buckets == Set(1, 2, 3),
          s"$lang (${rows.size} docs) should span all terciles: $buckets")
    }
  }

  test("m10 audio fingerprint: golden delta-sign bits from the sample formula") {
    val s = spark; import s.implicits._
    // one real WAV through the real encoder+decoder, bits recomputed
    // in plain Scala from the m7 sample formula
    val id = 7L
    val assets = graft.multimodal.Multimodal.syntheticWavAssets(
      Seq(id).toDF("doc_id"), "doc_id")
    val got = graft.multimodal.Multimodal
      .audioFingerprint(assets, windowSamples = 1)
      .collect().map(r => (r.getLong(0),
        r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
    val n = 64 + (id % 64).toInt
    val v = (0 until n).map(k =>
      ((id * 2654435761L + k * 1013904223L) % 20001L - 10000L).toInt)
    val chunks = new Array[Int](4)
    for (i <- 0 until 64 if i + 1 < n && v(i + 1) > v(i))
      chunks(i / 16) |= 1 << (i % 16)
    assert(got == Seq((id, chunks(0), chunks(1), chunks(2), chunks(3))))
  }

  test("m10 audio dedup: planted fill-groups collapse; longest duration kept") {
    val dec = SparkEntry.queries("m10_audio_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    Caches.release(spark)
    assert(dec.size == 500)
    assert(dec.forall { case (id, (rep, kept)) => kept == (id == rep) })
    // byte-identical copies in a fill group always share one rep
    dec.keys.groupBy(id => id - id % 5).foreach { case (fid, ids) =>
      assert(ids.map(id => dec(id)._1).toSet.size == 1,
        s"fill group $fid split across reps")
    }
    dec.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.values.count(_._2) == 1)
      assert(dec(rep)._2, s"representative $rep must be kept")
    }
  }

  test("m10 streaming face: decision from folded fingerprint state == batch m10") {
    import graft.streaming.DedupStreams
    val assets = graft.operators.PipelineQueries.m10PlantedAssets(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_m10stream").toString
    assets.repartition(3).write.parquet(s"$tmp/src")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    DedupStreams.streamingAudioFps(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val streamed = DedupStreams.audioDedupFromState(spark, s"$tmp/state")
    assert(streamed.isDefined, "no committed audio fingerprint state")
    val batch = SparkEntry.queries("m10_audio_dedup")(spark, sfDir)
    assert(rows(streamed.get) == rows(batch))
    Caches.release(spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("t48 classifier generalizes past the rules it distilled") {
    val s = spark; import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t48").toString
    val good = (1 to 10).map(i => s"goodword$i")
    val bad = (1 to 10).map(i => s"badword$i")
    def txt(ws: Seq[String], reps: Int) =
      Seq.fill(reps)(ws).flatten.mkString(" ")
    // train slice (%3==0): two 60-word keep docs of GOOD vocabulary,
    // two 10-word drop docs of BAD vocabulary (fail the 50-word rule)
    val rows = Seq(
      (0L, txt(good, 6)), (3L, txt(good, 6)),
      (6L, txt(bad, 1)), (9L, txt(bad, 1)),
      // held-out: a SHORT good-vocab doc (the rules would drop it) and
      // a LONG bad-vocab doc (the rules would keep it) — the model's
      // vocabulary signal must override the length signal both ways
      (1L, txt(good, 1)), (2L, txt(bad, 6)))
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("t48_quality_classifier")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    Caches.release(spark)
    assert(got(1L), "short good-vocab doc: classifier must keep " +
      "(the rule gate alone would drop it)")
    assert(!got(2L), "long bad-vocab doc: classifier must drop " +
      "(the rule gate alone would keep it)")
    assert(got(0L) && got(3L) && !got(6L) && !got(9L),
      s"train docs must score with their own class: $got")
  }

  test("streaming quality counts: scores from folded state == batch t48") {
    import graft.streaming.ModelStreams
    import graft.operators.TextAnalysis
    val train = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_t48stream").toString
    train.repartition(3).write.parquet(s"$tmp/src")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    ModelStreams.streamingQualityCounts(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextAnalysis.segTokens(col("text")).as("tk"))
    val streamed = ModelStreams.qualityFromState(spark, s"$tmp/state", d)
    assert(streamed.isDefined, "no committed quality-count state")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(rows(streamed.get) ==
      rows(SparkEntry.queries("t48_quality_classifier")(spark, sfDir)))
    Caches.release(spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("m11 video dedup: planted fill-groups collapse; one kept rep per cluster") {
    val dec = SparkEntry.queries("m11_video_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    Caches.release(spark)
    assert(dec.size == 500)
    assert(dec.forall { case (id, (rep, kept)) => kept == (id == rep) })
    // byte-identical copies in a fill group of 3 always share one rep
    dec.keys.groupBy(id => id - id % 3).foreach { case (fid, ids) =>
      assert(ids.map(id => dec(id)._1).toSet.size == 1,
        s"fill group $fid split across reps")
    }
    dec.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.values.count(_._2) == 1)
      assert(dec(rep)._2, s"representative $rep must be kept")
    }
    // the fingerprint's documented blind spot: 1-pixel frames hash to
    // zero, so ALL fid%48==0 videos (w=1 forces h=1) share one exact
    // frameset signature and must land in one cluster
    val blind = dec.keys.filter(id => (id - id % 3) % 48 == 0)
      .map(id => dec(id)._1).toSet
    assert(blind.size == 1, s"blind-spot class split across reps: $blind")
  }

  test("m11 streaming face: decision from folded frame-hash state == batch m11") {
    import graft.streaming.DedupStreams
    val s = spark
    val d = Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 3).as("fid"))
    val base = graft.multimodal.Multimodal.syntheticVideoAssets(
      d.select(col("fid").as("doc_id")).distinct(), "doc_id")
    val assets = d.join(base.withColumnRenamed("asset_id", "fid"), "fid")
      .select(col("doc_id").as("asset_id"), col("content"), col("meta"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_m11stream").toString
    assets.repartition(3).write.parquet(s"$tmp/src")
    val raw = s.readStream
      .schema(s.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    DedupStreams.streamingVideoFrameHashes(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val streamed = DedupStreams.videoDedupFromState(s, s"$tmp/state")
    assert(streamed.isDefined, "no committed frame-hash state")
    val batch = SparkEntry.queries("m11_video_dedup")(s, sfDir)
    assert(rows(streamed.get) == rows(batch))
    Caches.release(s)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("gcTempKeyed: OLD temp-keyed sidecars swept; keep-key, real-corpus and FRESH temp keys survive") {
    import graft.store.AnnIndexes
    // force session init FIRST — it runs its own keepKey-less sweep,
    // which must not race the fixture dirs created below
    val s = spark
    val root = new java.io.File(AnnIndexes.root)
    root.mkdirs()
    val doomed = new java.io.File(root, "bpe2__tmp_gcspec_dead_cafe01")
    val kept = new java.io.File(root, "bpe2__tmp_gcspec_live_cafe02")
    val real = new java.io.File(root, "bpe2__root_testdata_sf0.001_cafe03")
    val fresh = new java.io.File(root, "bpe2__tmp_gcspec_fresh_cafe04")
    Seq(doomed, kept, real, fresh).foreach(_.mkdirs())
    // age the sweepable candidates past the 3 h threshold; `fresh`
    // keeps its just-created mtime — the concurrent-sbt live sidecar
    // the round-13 age gate exists to protect
    val old = System.currentTimeMillis() - 4L * 3600 * 1000
    Seq(doomed, kept, real).foreach(f => assert(f.setLastModified(old)))
    try {
      AnnIndexes.gcTempKeyed(s, keepKey = "_tmp_gcspec_live")
      assert(!doomed.exists, "old unkeyed temp sidecar must be swept")
      assert(kept.exists, "the active corpus's sidecars must survive")
      assert(real.exists, "real-corpus sidecars must never be touched")
      assert(fresh.exists,
        "a freshly-written temp sidecar (possibly a concurrent run's) " +
          "must survive the sweep")
    } finally Seq(doomed, kept, real, fresh).filter(_.exists)
      .foreach(f => org.apache.commons.io.FileUtils.deleteDirectory(f))
  }

  test("htmlToText: prose '<script' / commented-out script don't eat the tail") {
    import graft.sources.Sources
    // commented-out script must not trigger the unclosed-script fallback
    val withComment = "<html><body><p>alpha</p>" +
      "<!-- legacy: <script>var x;</script> --><p>omega tail</p></body></html>"
    assert(Sources.htmlToText(withComment) == "alpha omega tail")
    // a quoted '<script' in visible text (no tag-open shape after the
    // name) must not truncate the rest of the page
    val prose = "<html><body><p>alpha</p>" +
      "<p>never write \"<script\" unquoted</p><p>omega tail</p></body></html>"
    assert(Sources.htmlToText(prose).endsWith("omega tail"))
    // a REAL unclosed script still drops to end-of-input
    val unclosed = "<html><body><p>alpha</p>" +
      "<script src=\"x.js\">var leaked = 1;<p>not content</p></body></html>"
    assert(Sources.htmlToText(unclosed) == "alpha")
    // an unclosed comment comments out the rest (what a browser renders)
    val unclosedComment =
      "<html><body><p>alpha</p><!-- cut here <p>gone</p></body></html>"
    assert(Sources.htmlToText(unclosedComment) == "alpha")
  }
}
