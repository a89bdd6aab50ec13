package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Packing, TextQueries}

/** Round-17 operator specs: append BATCH IDENTITY (the id-disjointness
  * guard + the `_batches` replay ledger — a re-submitted
  * already-committed batch is refused loudly or no-ops cleanly, never
  * double-packed), the new-phase crashed-append guard, the
  * missing-`_params` budget fallback, the t55 data card's
  * cell-by-cell recompute, the m21 alignment plant classes, the
  * streaming state TTLs (expired keys leave the state store), the
  * t52 from-state face, and the pack-boundary collator table. */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  val AllSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  private def phasedDocs(dir: String): DataFrame = {
    val docsDf = Tables.load(spark, dir, "documents")
    TextQueries.curriculumPhases(docsDf)
      .select("doc_id", "phase")
      .join(docsDf.select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text"))
          .as("n_tokens")), "doc_id")
  }

  private def fileHashes(root: String): Map[String, String] = {
    val base = java.nio.file.Paths.get(root)
    val out = scala.collection.mutable.Map.empty[String, String]
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        out(base.relativize(p).toString) = d.map("%02x".format(_)).mkString
      }
    }
    out.toMap
  }

  // -------------------------------------------------------------
  // batch identity: resubmission refused; batch-id replay no-ops
  // -------------------------------------------------------------

  test("append batch identity: a re-submitted committed batch is refused; the same batchId replays as a no-op — at 3 SFs") {
    val ctx = 256
    val pps = 4
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bid").toString
      try {
        val s = spark
        import s.implicits._
        val rows = phasedDocs(dir).select("doc_id", "phase", "n_tokens")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val sortedIds = rows.map(_._1).sorted
        val thr = sortedIds(sortedIds.length * 9 / 10)
        val batch0 = rows.filter(_._1 < thr).toSeq
          .toDF("doc_id", "phase", "n_tokens")
        val batch1 = rows.filter(_._1 >= thr).toSeq
          .toDF("doc_id", "phase", "n_tokens")
        Packing.writeCurriculumShards(batch0, "doc_id", "n_tokens",
          "phase", "-p9", ctx, pps, s"$tmp/shards")
        // first append commits and records the batch id
        assert(Packing.appendCurriculumShards(batch1, "doc_id",
          "n_tokens", "phase", "-p9", ctx, pps, s"$tmp/shards",
          batchId = Some("batch-1")),
          s"$dir: first append must commit")
        val committed = fileHashes(s"$tmp/shards")
        // the orchestrator's lost-ack retry WITH the batch id: a clean
        // no-op — nothing on disk changes
        assert(!Packing.appendCurriculumShards(batch1, "doc_id",
          "n_tokens", "phase", "-p9", ctx, pps, s"$tmp/shards",
          batchId = Some("batch-1")),
          s"$dir: replayed batch id must no-op")
        assert(fileHashes(s"$tmp/shards") == committed,
          s"$dir: replay must leave the artifact byte-identical")
        // the same retry WITHOUT a batch id: the id-disjointness guard
        // must refuse loudly (exact collision when few spans overlap,
        // the bounded-verification refusal when many do) — round 16
        // double-packed here silently
        val e = intercept[IllegalArgumentException] {
          Packing.appendCurriculumShards(batch1, "doc_id", "n_tokens",
            "phase", "-p9", ctx, pps, s"$tmp/shards")
        }
        assert(e.getMessage.contains("already packed") ||
          e.getMessage.contains("refusing to verify"), s"$dir: $e")
        assert(fileHashes(s"$tmp/shards") == committed,
          s"$dir: refused append must not touch the artifact")
        assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
          .count() == 0, s"$dir: artifact intact after refusals")
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("append id-overlap guard: a single already-packed id inside a fresh batch is rejected; interleaved-but-disjoint ids still append") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ovl").toString
    try {
      val s = spark
      import s.implicits._
      val ctx = 256
      val pps = 4
      val rows = phasedDocs(sfDir).select("doc_id", "phase", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // interleaved split: every 10th id goes to the batch — id RANGES
      // overlap everywhere, so the guard must fall through to the
      // exact partition-pruned membership check and still allow it
      val batch0 = rows.filter(_._1 % 10 != 0).toSeq
        .toDF("doc_id", "phase", "n_tokens")
      val batch1 = rows.filter(_._1 % 10 == 0).toSeq
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(batch0, "doc_id", "n_tokens",
        "phase", "-p9", ctx, pps, s"$tmp/shards")
      assert(Packing.appendCurriculumShards(batch1, "doc_id", "n_tokens",
        "phase", "-p9", ctx, pps, s"$tmp/shards"),
        "interleaved-but-disjoint batch must append")
      // decision identity still holds under the composite order
      val union = batch0.withColumn("batch", lit(0L))
        .unionByName(batch1.withColumn("batch", lit(1L)))
        .filter(col("n_tokens") > 0)
      val truth = Packing.perPhaseSegments(
        Packing.perPhasePackOffsets(union, "doc_id", "n_tokens",
          "phase", "-p9", ctx, pps, preOrderCols = Seq("batch")),
        "n_tokens", ctx, pps)
      val cols = Seq("doc_id", "phase", "pos", "n_tokens",
        "start_offset", "pack_id", "n_spans", "seg_tokens", "shard_id")
      val disk = spark.read.parquet(s"$tmp/shards")
        .withColumn("phase", col("phase").cast("long"))
        .withColumn("shard_id", col("shard_id").cast("long"))
        .select(cols.map(col): _*)
      val t = truth.select(cols.map(col): _*)
      assert(disk.exceptAll(t).count() == 0 &&
        t.exceptAll(disk).count() == 0,
        "interleaved append diverges from the union re-pack")
      // now a "fresh" batch that smuggles ONE committed id among new
      // ones: rejected by the exact check, naming the id
      val maxId = rows.map(_._1).max
      val dupe = rows.head
      val bad = Seq((maxId + 1000L, dupe._2, 64L),
          (dupe._1, dupe._2, dupe._3))
        .toDF("doc_id", "phase", "n_tokens")
      val e = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(bad, "doc_id", "n_tokens",
          "phase", "-p9", ctx, pps, s"$tmp/shards")
      }
      assert(e.getMessage.contains("already packed") &&
        e.getMessage.contains(dupe._1.toString), e.getMessage)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // crashed-append guard, new-phase class
  // -------------------------------------------------------------

  test("append refuses when a phase directory exists that the manifest does not describe (new-phase crashed append)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nph").toString
    try {
      val s = spark
      import s.implicits._
      val b0 = Seq((1L, 1L, 16L), (2L, 2L, 8L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards")
      // footprint of an append that INTRODUCED phase 9 and died
      // before its manifest append: a phase directory with zero
      // manifest rows — the per-phase tail guards never look at it,
      // so without the round-17 listing guard the next append to
      // phase 9 would seed from zero and collide silently
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/shards/phase=9/shard_id=0"))
      val b1 = Seq((11L, 9L, 8L)).toDF("doc_id", "phase", "n_tokens")
      val e = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
          "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards")
      }
      assert(e.getMessage.contains("manifest has no rows"), e.getMessage)
      // the guard fires even for a batch that never mentions phase 9 —
      // the artifact is inconsistent, full stop
      val b2 = Seq((12L, 1L, 8L)).toDF("doc_id", "phase", "n_tokens")
      val e2 = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b2, "doc_id", "n_tokens", "phase",
          "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards")
      }
      assert(e2.getMessage.contains("manifest has no rows"), e2.getMessage)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // missing _params: budget fallback + sidecar persisted on append
  // -------------------------------------------------------------

  test("append to a pre-sidecar artifact sanity-checks the shard budget and persists _params") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nop").toString
    try {
      val s = spark
      import s.implicits._
      // 70 tokens at budget 32 → shards 0/1 full (non-final), shard 2
      // partial — the manifest can witness the budget
      val b0 = Seq((1L, 1L, 40L), (2L, 1L, 30L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards")
      // simulate a round-15 artifact: no _params sidecar
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/shards/_params"))
      // wrong budget: round 16 skipped the check entirely here and
      // would interleave incompatible pack boundaries — must refuse
      val b1 = Seq((10L, 1L, 8L)).toDF("doc_id", "phase", "n_tokens")
      val e = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
          "-p9", ctxSize = 8, packsPerShard = 2, s"$tmp/shards")
      }
      assert(e.getMessage.contains("no _params sidecar"), e.getMessage)
      // correct budget: append proceeds AND persists the sidecar so
      // every later append cross-checks properly
      assert(Packing.appendCurriculumShards(b1, "doc_id", "n_tokens",
        "phase", "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards"))
      val prm = spark.read.parquet(s"$tmp/shards/_params").head
      assert(prm.getAs[Long]("ctx_size") == 16L &&
        prm.getAs[Long]("packs_per_shard") == 2L &&
        prm.getAs[String]("salt") == "-p9")
      assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .count() == 0)
      // and now a mismatched append is caught by the sidecar path
      val e2 = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(
          Seq((20L, 1L, 8L)).toDF("doc_id", "phase", "n_tokens"),
          "doc_id", "n_tokens", "phase", "-p9", ctxSize = 8,
          packsPerShard = 2, s"$tmp/shards")
      }
      assert(e2.getMessage.contains("_params"), e2.getMessage)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // t55 data card: every cell from the standalone gate outputs
  // -------------------------------------------------------------

  test("t55 data card: every cell recomputes from the standalone gate outputs") {
    val s = spark
    val dir = sfDir
    val docsDf = Tables.load(s, dir, "documents")
    val lang = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val g = TextQueries.qualityLabels(docsDf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b = SparkEntry.queries("t50_toxicity_filter")(s, dir)
      .select("doc_id", "c4_keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val dk = TextQueries.textDupDecision(s, dir).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Boolean]("kept")).toMap
    val ck = SparkEntry.queries("d21_benchmark_decontamination")(s, dir)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> !r.getBoolean(1)).toMap
    val sc = SparkEntry.queries("t48_quality_classifier")(s, dir)
      .select("doc_id", "n_tokens", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val pii = SparkEntry.queries("t54_pii_redaction")(s, dir)
      .select("doc_id", "pii_free").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bins = TextQueries.withReadability(docsDf)
      .select(col("doc_id"), round(col("fk") * 10).cast("long").as("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // plain-Scala fold, one record per document, grouped by lang —
    // fully independent of the card's joined/aggregated plan
    case class Cell(id: Long, g: Boolean, b: Boolean, d: Boolean,
        c: Boolean, p: Boolean, nt: Long, pii: Boolean, bin: Long)
    val cells = lang.keys.toSeq.map { id =>
      val (nt, pk) = sc.getOrElse(id, (0L, false))
      Cell(id, g(id), b(id), dk(id), ck.getOrElse(id, true), pk, nt,
        pii(id), bins(id))
    }
    val want = cells.groupBy(c => lang(c.id))
    val card = SparkEntry.queries("t55_data_card")(s, dir).collect()
    assert(card.map(_.getString(0)).toSet == want.keySet,
      "card must cover exactly the corpus languages")
    card.foreach { r =>
      val cs = want(r.getString(0))
      val all = (c: Cell) => c.g && c.b && c.d && c.c && c.pii && c.p
      def n(name: String) = r.getAs[Long](name)
      assert(n("n_docs") == cs.size, s"${r.getString(0)} n_docs")
      assert(n("n_tokens") == cs.map(_.nt).sum, s"${r.getString(0)} nt")
      assert(n("gopher_pass") == cs.count(_.g))
      assert(n("blocklist_pass") == cs.count(_.b))
      assert(n("dedup_pass") == cs.count(_.d))
      assert(n("decon_pass") == cs.count(_.c))
      assert(n("pii_free_docs") == cs.count(_.pii))
      assert(n("classifier_pass") == cs.count(_.p))
      assert(n("docs_kept") == cs.count(all))
      assert(n("tokens_kept") == cs.filter(all).map(_.nt).sum)
      assert(n("fk_bin_sum") == cs.map(_.bin).sum)
      assert(math.abs(r.getAs[Double]("doc_keep_rate") -
        cs.count(all).toDouble / cs.size) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_fk_bin") -
        cs.map(_.bin).sum.toDouble / cs.size) < 1e-3)
    }
    // and the gates individually fire somewhere: a card whose columns
    // are all-pass would not witness the joins
    assert(card.map(_.getAs[Long]("dedup_pass")).sum <
      card.map(_.getAs[Long]("n_docs")).sum, "dedup gate never fired")
    assert(card.map(_.getAs[Long]("pii_free_docs")).sum <
      card.map(_.getAs[Long]("n_docs")).sum, "pii gate never fired")
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // m21 caption–image alignment: planted classes + curation compose
  // -------------------------------------------------------------

  test("m21: aligned plants score cosine 1, misaligned plants 0, and curation-dropped captions never reach the gate") {
    val out = SparkEntry.queries("m21_caption_alignment")(spark, sfDir)
      .collect()
    def url(r: org.apache.spark.sql.Row) = r.getAs[String]("image_url")
    val aligned = out.filter(r => url(r).contains("m21.example") &&
      url(r).endsWith("/a.png"))
    val mis = out.filter(r => url(r).contains("m21.example") &&
      url(r).endsWith("/m.png"))
    assert(aligned.nonEmpty && mis.nonEmpty, "both plant classes present")
    aligned.foreach { r =>
      // the decoded histogram EQUALS the caption histogram: mass
      // identical, cosine 1 within the sqrt ulp, verdict true
      assert(r.getAs[Long]("cap_mass") == r.getAs[Long]("img_mass"), r)
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-6, r)
      assert(r.getAs[Boolean]("aligned"), r)
    }
    mis.foreach { r =>
      // bucket-10 captions vs a bucket-2 image: exactly orthogonal
      assert(r.getAs[Double]("cos_sim") == 0.0 &&
        !r.getAs[Boolean]("aligned"), r)
    }
    // generic m14 captions flow through with the id-pure fill
    assert(out.exists(r => !url(r).contains("m21.example")),
      "generic pairs must be scored too")
    // the m16 curation rules run FIRST: the placeholder and
    // boilerplate plants never reach the alignment gate
    assert(!out.exists(r => url(r).endsWith("/pl.png") ||
      url(r).endsWith("/sb.png") || url(r).endsWith("/ui.png")),
      "curation-dropped captions leaked into the alignment gate")
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // streaming state TTL: expired keys leave the state store
  // -------------------------------------------------------------

  import graft.streaming.EventStreams
  import graft.streaming.EventStreams.TypedEv

  private def lastStateRows(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal)
      .getOrElse(-1L)

  test("streamingFunnel TTL: abandoned users leave the state store after the horizon; in-horizon stages are unaffected") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TypedEv]
    val q = EventStreams.streamingFunnel(ms.toDS(), horizonSeconds = 100L)
      .toDF().writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    def sec(n: Long) = n * 1000000L
    try {
      // t=1000s: user 1 abandons after a view; user 2 views
      ms.addData(TypedEv(1L, sec(1000), 1L, "view"),
        TypedEv(2L, sec(1000), 2L, "view"))
      q.processAllAvailable()
      // t=1050s — inside user 2's horizon: the click still lands
      ms.addData(TypedEv(3L, sec(1050), 2L, "click"))
      q.processAllAvailable()
      // far future: advances the watermark past both users' horizons
      ms.addData(TypedEv(4L, sec(5000), 3L, "view"))
      q.processAllAvailable()
      // next batch evaluates timeouts against that watermark — users
      // 1 and 2 are evicted, only users 3 and 4 keep state
      ms.addData(TypedEv(5L, sec(5001), 4L, "view"))
      q.processAllAvailable()
      assert(lastStateRows(q) == 2L,
        s"expected users 1/2 evicted, state=${lastStateRows(q)}")
      val out = s.table("funnel_ttl").collect()
      assert(out.exists(r => r.getAs[Long]("user_id") == 2L &&
        r.getAs[Long]("stage") == 2L),
        "in-horizon stage transition must still emit")
      assert(out.count(_.getAs[Long]("user_id") == 1L) == 1,
        "abandoned user keeps exactly its view row")
    } finally q.stop()
  }

  test("streamingRetention TTL: offsets bound to the horizon; expired users leave the state store") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val weekUs = 604800000000L
    def atWk(w: Long) = w * weekUs + 1000L
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TypedEv]
    val q = EventStreams.streamingRetention(ms.toDS(),
        horizonWeeks = 2L)
      .toDF().writeStream.format("memory").queryName("ret_ttl")
      .outputMode("append").start()
    try {
      // user 1: signup week 100, active weeks 100/101/103 — offset 3
      // is PAST the 2-week horizon and must not emit; user 2 never
      // signs up (pre-history only)
      ms.addData(TypedEv(1L, atWk(100), 1L, "signup"),
        TypedEv(2L, atWk(100), 2L, "view"))
      q.processAllAvailable()
      ms.addData(TypedEv(3L, atWk(101), 1L, "view"),
        TypedEv(4L, atWk(101), 2L, "view"))
      q.processAllAvailable()
      ms.addData(TypedEv(5L, atWk(103), 1L, "view"))
      q.processAllAvailable()
      val cells = s.table("ret_ttl").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cohort_wk"),
          r.getAs[Long]("week_offset"))).toSet
      assert(cells == Set((1L, 100L, 0L), (1L, 100L, 1L)),
        s"horizon must cap offsets: $cells")
      // far future: watermark passes every horizon; the next batch
      // evicts users 1 and 2 — only the fresh user remains
      ms.addData(TypedEv(6L, atWk(200), 3L, "signup"))
      q.processAllAvailable()
      ms.addData(TypedEv(7L, atWk(200) + 1L, 4L, "view"))
      q.processAllAvailable()
      assert(lastStateRows(q) == 2L,
        s"expected users 1/2 evicted, state=${lastStateRows(q)}")
    } finally q.stop()
  }

  // -------------------------------------------------------------
  // t52-from-state: the funnel report with zero corpus re-reads
  // -------------------------------------------------------------

  test("funnelFromState + dataCardFromState: the reports folded from committed states equal the oracle-checked batch t52 and t55") {
    import graft.operators.Cdc
    import graft.streaming.{DedupStreams, FunnelStreams, ModelStreams}
    val s = spark
    val dir = sfDir
    val tmp = java.nio.file.Files.createTempDirectory("graft_fst").toString
    try {
      val docsDf = Tables.load(s, dir, "documents")
        .select("doc_id", "text", "n_chars", "lang")
      val (train, bench) = TextQueries.decontamInputs(s, dir)
      // the benchmark stream folds FIRST (screen-at-ingest contract)
      for (i <- 0 until 2)
        Cdc.foldBatch(bench.filter(pmod(col("doc_id"), lit(2)) === i),
          i.toLong, s"$tmp/bgrams", Seq("g"),
          DedupStreams.benchGramBatch(13))
      // the corpus arrives in 5 append batches; each state folds its
      // own O(batch) delta
      for (i <- 0 until 5) {
        val slice = pmod(col("doc_id"), lit(5)) === i
        val b = docsDf.filter(slice)
        Cdc.foldBatch(b, i.toLong, s"$tmp/gates", Seq("doc_id"),
          FunnelStreams.gateFlagBatch, FunnelStreams.mergeMin)
        Cdc.foldBatch(b, i.toLong, s"$tmp/fps", Seq("id", "fp"),
          DedupStreams.winnowFpBatch(8, 4))
        Cdc.foldBatch(train.filter(slice), i.toLong, s"$tmp/contam",
          Seq("doc_id"), FunnelStreams.contamFlagBatch(s"$tmp/bgrams"),
          FunnelStreams.mergeMin)
        // the classifier trains on the %3==0 slice (t48's convention)
        Cdc.foldBatch(
          b.filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id",
            "text"),
          i.toLong, s"$tmp/quality", Seq("kind", "keep", "tok"),
          ModelStreams.qualityCountBatch)
        Cdc.foldBatch(b, i.toLong, s"$tmp/toks", Seq("doc_id", "tok"),
          FunnelStreams.docTokBatch)
      }
      val got = FunnelStreams.funnelFromState(s, s"$tmp/gates",
        s"$tmp/fps", s"$tmp/contam", s"$tmp/quality", s"$tmp/toks")
      assert(got.isDefined, "all states committed — report must exist")
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)))
      val fromState = got.get.collect().map(key).toSet
      val batch = SparkEntry.queries("t52_filter_funnel")(s, dir)
        .collect().map(key).toSet
      assert(fromState == batch,
        s"from-state funnel diverges:\n  state=$fromState\n  batch=$batch")
      // non-vacuous: the funnel really removed something at each of
      // the data-dependent stages
      assert(batch.exists(r => r._1 == 3L && r._4 < r._3),
        "dedup stage removed nothing")
      // the per-domain data card from the SAME five states — the
      // gate-flag state already carries lang/pii_free/bin, so the
      // card is three more projected columns into the shared fold
      val gotCard = FunnelStreams.dataCardFromState(s, s"$tmp/gates",
        s"$tmp/fps", s"$tmp/contam", s"$tmp/quality", s"$tmp/toks")
      assert(gotCard.isDefined, "all states committed — card must exist")
      val cardState = gotCard.get.collect().map(_.toString).toSeq
      val cardBatch = SparkEntry.queries("t55_data_card")(s, dir)
        .collect().map(_.toString).toSeq
      assert(cardState == cardBatch,
        s"from-state card diverges:\n  state=$cardState\n  batch=$cardBatch")
      assert(cardBatch.size > 1, "card must cover multiple languages")
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // pack boundaries: the collator's per-pack document-range table
  // -------------------------------------------------------------

  test("packBoundaries: boundaries equal the segment plan, are contiguous from 0, and fill every non-final pack — at 3 SFs") {
    val ctx = 256
    val pps = 4
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bnd").toString
      try {
        val phased = phasedDocs(dir)
        Packing.writeCurriculumShards(phased, "doc_id", "n_tokens",
          "phase", "-p9", ctx, pps, s"$tmp/shards")
        val bnd = Packing.packBoundaries(spark, s"$tmp/shards").collect()
        // 1) ≡ the segment plan: every (phase, pack, off, pos, doc,
        // seg) cell matches perPhaseSegments over the same input
        val segs = Packing.perPhaseSegments(
          Packing.perPhasePackOffsets(
            phased.withColumn("phase", col("phase").cast("long"))
              .withColumn("n_tokens", col("n_tokens").cast("long"))
              .filter(col("n_tokens") > 0),
            "doc_id", "n_tokens", "phase", "-p9", ctx, pps),
          "n_tokens", ctx, pps)
          .withColumn("off",
            greatest(col("start_offset"), col("pack_id") * ctx.toLong) -
              col("pack_id") * ctx.toLong)
          .select("phase", "pack_id", "off", "pos", "doc_id",
            "seg_tokens")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        val flat = bnd.flatMap { r =>
          val ph = r.getAs[Long]("phase")
          val pk = r.getAs[Long]("pack_id")
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("boundaries").map(b =>
            (ph, pk, b.getLong(0), b.getLong(1), b.getLong(2),
              b.getLong(3)))
        }.toSet
        assert(flat == segs, s"$dir: boundaries diverge from segments")
        // 2) collator invariants per pack: sorted, contiguous from 0,
        // and non-final packs sum to exactly ctx
        val lastPack = bnd.groupBy(_.getAs[Long]("phase"))
          .map { case (p, rs) => p -> rs.map(_.getAs[Long]("pack_id")).max }
        bnd.foreach { r =>
          val bs = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("boundaries")
          var expect = 0L
          bs.foreach { b =>
            assert(b.getLong(0) == expect,
              s"$dir: gap in pack ${r.getAs[Long]("pack_id")}")
            expect += b.getLong(3)
          }
          assert(expect == r.getAs[Long]("pack_tokens"))
          if (r.getAs[Long]("pack_id") !=
              lastPack(r.getAs[Long]("phase")))
            assert(expect == ctx.toLong,
              s"$dir: non-final pack not at budget: $expect")
        }
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  // -------------------------------------------------------------
  // epochShardOrder: the trainer's between-epoch shard permutation
  // -------------------------------------------------------------

  test("epochShardOrder: manifest-only per-epoch within-phase permutations match a plain-Scala md5 rank, complete and reproducible — at 3 SFs") {
    def md5Long15(x: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .take(15), 16)
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_eps").toString
      try {
        Packing.writeCurriculumShards(phasedDocs(dir), "doc_id",
          "n_tokens", "phase", "-p9", 256, 4, s"$tmp/shards")
        val manifestShards = Packing.readManifest(spark, s"$tmp/shards")
          .select("phase", "shard_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = Packing.epochShardOrder(spark, s"$tmp/shards", 3)
          .collect()
          .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("phase"),
            r.getAs[Long]("shard_id"), r.getAs[Long]("order_pos")))
        // 1) ≡ the plain-Scala permutation: per (epoch, phase), rank
        // of md5(phase|shard|'e'epoch) with the shard tie-break
        for (e <- 1L to 3L) {
          val want = manifestShards.toSeq.groupBy(_._1).flatMap {
            case (ph, shs) =>
              shs.map(_._2).sortBy(sh =>
                  (md5Long15(s"$ph|$sh|e$e"), sh))
                .zipWithIndex.map { case (sh, i) =>
                  (e, ph, sh, i.toLong) }
          }.toSet
          assert(got.filter(_._1 == e).toSet == want,
            s"$dir: epoch $e order diverges from the plain-Scala rank")
        }
        // 2) complete: every (epoch, phase) covers 0..n−1 over
        // exactly the manifest's shard set (implied by 1 ∧ counts)
        assert(got.length == manifestShards.size * 3,
          s"$dir: row count != #shards × epochs")
        // 3) reproducible: a second evaluation is identical
        val again = Packing.epochShardOrder(spark, s"$tmp/shards", 3)
          .collect()
          .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("phase"),
            r.getAs[Long]("shard_id"), r.getAs[Long]("order_pos")))
        assert(got.toSeq == again.toSeq, s"$dir: rerun diverged")
        // 4) epochs really reshuffle: some phase with ≥4 shards
        // orders differently across epochs (deterministic for this
        // fixed artifact)
        val bigPhases = manifestShards.groupBy(_._1)
          .filter(_._2.size >= 4).keySet
        if (bigPhases.nonEmpty) {
          val diverges = bigPhases.exists { ph =>
            def order(e: Long) = got.filter(r => r._1 == e && r._2 == ph)
              .sortBy(_._4).map(_._3).toSeq
            order(1L) != order(2L) || order(2L) != order(3L)
          }
          assert(diverges, s"$dir: epochs produced identical orders")
        }
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  // -------------------------------------------------------------
  // t56: the gate-drift monitor's recursion, plant, and alerts
  // -------------------------------------------------------------

  test("t56 gate drift: EWMA and alerts replay in plain Scala; the planted degradation zeroes the gopher rate and fires its alert — at 3 SFs") {
    for (dir <- AllSfs) {
      val rows = SparkEntry.queries("t56_gate_drift")(spark, dir)
        .collect()
        .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("n_docs"),
          Seq("g", "b", "p").map(g => (r.getAs[Long](s"${g}_rate6"),
            r.getAs[Long](s"${g}_ewma16"),
            r.getAs[Boolean](s"${g}_alert")))))
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq == (0L until 24L).toSeq,
        s"$dir: expected all 24 arrival batches")
      // 1) the 16ths EWMA recursion and the 15 pp alert rule recompute
      // from the emitted rates alone
      for (gi <- 0 until 3) {
        var e = -1L
        rows.foreach { case (b, _, gs) =>
          val (x, e16, alert) = gs(gi)
          val wantAlert = e >= 0 && math.abs(16L * x - e) > 2400000L
          assert(alert == wantAlert,
            s"$dir: batch $b series $gi alert diverges")
          e = if (e < 0) 16L * x else (3L * e + 16L * x) / 4L
          assert(e16 == e, s"$dir: batch $b series $gi ewma diverges")
        }
      }
      // 2) the plant: every degraded batch's gopher rate is exactly 0
      // (the scaled hash spam flips r_hash for every doc shape) and
      // the onset batch fires the gopher alert; the untouched gates
      // stay quiet there
      rows.filter(_._1 >= 20).foreach { case (b, _, gs) =>
        assert(gs(0)._1 == 0L, s"$dir: batch $b gopher rate not zeroed")
      }
      val onset = rows.find(_._1 == 20L).get._3
      assert(onset(0)._3, s"$dir: gopher alert did not fire at onset")
      assert(!onset(1)._3 && !onset(2)._3,
        s"$dir: untouched gates alerted at the plant onset")
      Caches.release(spark)
    }
  }

  test("pack-resume / pack-epochs CLI: the artifact faces drive end-to-end and report the library's answers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli").toString
    try {
      Packing.writeCurriculumShards(phasedDocs(sfDir), "doc_id",
        "n_tokens", "phase", "-p9", 256, 4, s"$tmp/shards")
      val total = Packing.readManifest(spark, s"$tmp/shards")
        .agg(sum("tokens")).head.getLong(0)
      val mid = total / 2
      val want = Packing.resumePlan(spark, s"$tmp/shards", Seq(mid))
        .collect()(0)
      val out1 = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out1)) {
        graft.cli.Demo.run(spark, "pack-resume", Map(
          "out" -> s"$tmp/shards", "tokens" -> s"$mid,${total + 7}"))
      }
      val res = out1.toString
      assert(res.contains(s"t=$mid -> phase=${want.getAs[Long]("phase")} " +
        s"shard=${want.getAs[Long]("shard_id")} " +
        s"pack=${want.getAs[Long]("pack_id")} " +
        s"offset=${want.getAs[Long]("offset_in_pack")}"),
        s"resume line missing:\n$res")
      assert(res.contains(s"past-the-end (training complete): ${total + 7}"),
        s"past-the-end note missing:\n$res")
      val out2 = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out2)) {
        graft.cli.Demo.run(spark, "pack-epochs", Map(
          "out" -> s"$tmp/shards", "epochs" -> "2"))
      }
      val nShards = Packing.readManifest(spark, s"$tmp/shards").count()
      assert(out2.toString.contains(s"${nShards * 2} rows"),
        s"epoch-order row count missing:\n${out2.toString}")
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // resumePlan: the trainer's restart lookup, metadata-only
  // -------------------------------------------------------------

  test("resumePlan: the metadata-only restart lookup matches a plain-Scala fold of the consumption order — at 3 SFs") {
    val ctx = 256L
    val pps = 4L
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_rsm").toString
      try {
        val phased = phasedDocs(dir)
        Packing.writeCurriculumShards(phased, "doc_id", "n_tokens",
          "phase", "-p9", ctx.toInt, pps.toInt, s"$tmp/shards")
        // ground truth: per-phase totals under the writer's input
        // contract (zero-token docs excluded), folded in plain Scala
        val totals = phased.filter(col("n_tokens") > 0)
          .groupBy("phase").agg(sum("n_tokens").as("ptok"))
          .orderBy("phase").collect()
          .map(r => (r.getAs[Number]("phase").longValue(),
            r.getAs[Long]("ptok")))
        val bases = totals.scanLeft(0L)(_ + _._2).init
        val total = totals.map(_._2).sum
        def expectAt(t: Long): (Long, Long, Long, Long) = {
          val i = totals.indices.findLast(j => bases(j) <= t).get
          val local = t - bases(i)
          (totals(i)._1, local / ctx / pps, local / ctx, local % ctx)
        }
        // checkpoints: the first token, a mid-phase point per phase,
        // every PHASE BOUNDARY (resume must land on the next phase's
        // pack 0 offset 0), the last token, and two past-the-end
        // offsets (training done — they must drop out)
        val mids = totals.indices.map(j => bases(j) + totals(j)._2 / 2)
        val cks = (Seq(0L, total - 1, total, total + 5) ++
          bases.tail ++ mids).distinct
        val got = Packing.resumePlan(spark, s"$tmp/shards", cks)
          .collect()
          .map(r => r.getAs[Long]("t_global") ->
            (r.getAs[Long]("phase"), r.getAs[Long]("shard_id"),
              r.getAs[Long]("pack_id"), r.getAs[Long]("offset_in_pack")))
          .toMap
        val live = cks.filter(_ < total)
        assert(got.keySet == live.toSet,
          s"$dir: past-the-end checkpoints must drop, live ones stay")
        live.foreach { t =>
          assert(got(t) == expectAt(t), s"$dir: resume at $t diverges: " +
            s"got=${got(t)} want=${expectAt(t)}")
        }
        // the boundary rows really are next-phase pack-0 starts
        bases.tail.filter(_ < total).foreach { t =>
          assert(got(t)._3 == 0L && got(t)._4 == 0L,
            s"$dir: phase-boundary resume not at pack 0 offset 0")
        }
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }
}
