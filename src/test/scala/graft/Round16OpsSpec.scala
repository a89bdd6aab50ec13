package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Packing, TextQueries}

/** Round-16 operator specs: the curriculum shard MANIFEST (p12 +
  * `_manifest` sidecar), the manifest-driven integrity check
  * (`pack-verify`), and INCREMENTAL pack maintenance
  * (appendCurriculumShards — closed shards byte-identical, append ≡
  * full re-pack of the union under the composite (batch, md5) order,
  * artifact reads bounded by tail + manifest). */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  val AllSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** (doc_id, phase, n_tokens) for a docs dir — the writer's input
    * shape, phases from the ONE shared schedule. */
  private def phasedDocs(dir: String): DataFrame = {
    val docsDf = Tables.load(spark, dir, "documents")
    TextQueries.curriculumPhases(docsDf)
      .select("doc_id", "phase")
      .join(docsDf.select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text"))
          .as("n_tokens")), "doc_id")
  }

  /** md5 of every regular file under `root`, keyed by relative path. */
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
  // p12 manifest: written `_manifest` ≡ data ≡ the oracle-checked query
  // -------------------------------------------------------------

  test("manifest: written _manifest matches a recompute from the shard data at 3 SFs") {
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_p12").toString
      try {
        Packing.writeCurriculumShards(phasedDocs(dir), "doc_id",
          "n_tokens", "phase", "-p9", ctxSize = 512, packsPerShard = 4,
          s"$tmp/shards")
        val bad = Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        assert(bad.count() == 0, s"$dir: manifest/data divergence")
        // and the manifest is non-trivial: one row per on-disk
        // (phase, shard) partition
        val man = Packing.readManifest(spark, s"$tmp/shards")
        val parts = spark.read.parquet(s"$tmp/shards")
          .select(col("phase").cast("long"), col("shard_id").cast("long"))
          .distinct().count()
        assert(man.count() == parts && parts > 0, s"$dir: $parts partitions")
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("manifest: the p12 query equals the _manifest the writer persists (same ctx/pps)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_p12q").toString
    try {
      // the p12 query's parameters: ctx 2048, 64 packs per shard
      Packing.writeCurriculumShards(phasedDocs(sfDir), "doc_id",
        "n_tokens", "phase", "-p9", ctxSize = 2048, packsPerShard = 64,
        s"$tmp/shards")
      val persisted = Packing.readManifest(spark, s"$tmp/shards")
      val q = SparkEntry.queries("p12_pack_manifest")(spark, sfDir)
      assert(q.exceptAll(persisted).count() == 0 &&
        persisted.exceptAll(q).count() == 0,
        "p12 query vs persisted manifest")
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // pack-verify: a corrupted artifact is caught
  // -------------------------------------------------------------

  test("pack-verify: deleting one shard's data file is caught; the CLI fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pv").toString
    try {
      Packing.writeCurriculumShards(phasedDocs(sfDir), "doc_id",
        "n_tokens", "phase", "-p9", ctxSize = 512, packsPerShard = 4,
        s"$tmp/shards")
      assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .count() == 0, "intact artifact must verify clean")
      // corrupt: drop one shard partition's parquet file
      val victim = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$tmp/shards"))
        .filter(p => p.toString.endsWith(".parquet") &&
          p.toString.contains("shard_id="))
        .findFirst().get()
      java.nio.file.Files.delete(victim)
      val bad = Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .collect()
      assert(bad.nonEmpty, "corruption must surface as a mismatch row")
      // the CLI surfaces it as a hard failure
      val buf = new java.io.ByteArrayOutputStream()
      val err = intercept[RuntimeException] {
        Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
          graft.cli.Demo.run(spark, "pack-verify",
            Map("out" -> s"$tmp/shards"))
        }
      }
      assert(err.getMessage.contains("diverge"), err.getMessage)
      assert(buf.toString("UTF-8").contains("MISMATCH"))
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // incremental append: immutability + decision identity + O(new) reads
  // -------------------------------------------------------------

  test("appendCurriculumShards: closed shards byte-identical; append ≡ union re-pack under (batch, md5) order; reads bounded by tail+manifest") {
    val ctx = 256
    val pps = 4
    val shardTokens = ctx.toLong * pps
    for (dir <- AllSfs) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_app").toString
      try {
        // ONE fixed phase schedule over the full corpus (an appender
        // must not re-derive phases from the union — that would
        // reshuffle old documents' phases and contradict immutability)
        val phased = phasedDocs(dir)
        val rows = phased.select("doc_id", "phase", "n_tokens").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val s = spark
        import s.implicits._
        // driver-local batches: the read-bound assertion below must
        // count ONLY artifact reads, not re-scans of the docs parquet.
        // MONOTONE id split (batch = the top decile of ids) — the
        // production appender shape the O(new) contract models, and
        // what keeps the round-17 id-disjointness guard metadata-only
        // (zero overlapping spans); the interleaved-id path has its
        // own spec below
        val sortedIds = rows.map(_._1).sorted
        val thr = sortedIds(sortedIds.length * 9 / 10)
        val batch0 = rows.filter(_._1 < thr).toSeq
          .toDF("doc_id", "phase", "n_tokens")
        val batch1 = rows.filter(_._1 >= thr).toSeq
          .toDF("doc_id", "phase", "n_tokens")
        Packing.writeCurriculumShards(batch0, "doc_id", "n_tokens",
          "phase", "-p9", ctx, pps, s"$tmp/shards")
        val before = fileHashes(s"$tmp/shards")
        val segsBefore = spark.read.parquet(s"$tmp/shards").count()
        val man0 = Packing.readManifest(spark, s"$tmp/shards").collect()
        val manRows = man0.length.toLong
        // each phase's reopenable tail = its last shard when partial
        val reopen = man0.groupBy(_.getAs[Long]("phase")).flatMap {
          case (p, rs) =>
            val tok = rs.map(_.getAs[Long]("tokens")).sum
            val last = rs.map(_.getAs[Long]("shard_id")).max
            if (tok % shardTokens != 0) Some((p, last)) else None
        }.toSet
        val tailRows = if (reopen.isEmpty) 0L
          else spark.read.parquet(s"$tmp/shards")
            .filter(reopen.map { case (p, sh) =>
              col("phase") === lit(p) && col("shard_id") === lit(sh)
            }.reduce(_ || _)).count()

        // append under an input-records listener
        val rec = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskMetrics != null)
              rec.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
        spark.sparkContext.addSparkListener(listener)
        try
          Packing.appendCurriculumShards(batch1, "doc_id", "n_tokens",
            "phase", "-p9", ctx, pps, s"$tmp/shards")
        finally {
          // listener delivery is async: wait for the count to settle
          var prev = -1L
          var spins = 0
          while (rec.get() != prev && spins < 50) {
            prev = rec.get(); Thread.sleep(200); spins += 1
          }
          spark.sparkContext.removeSparkListener(listener)
        }

        // 1) immutability: every pre-existing file outside the
        // reopened tail partitions is byte-identical
        val after = fileHashes(s"$tmp/shards")
        val reopenDirs = reopen.map { case (p, sh) =>
          s"phase=$p/shard_id=$sh" }
        before.foreach { case (rel, h) =>
          if (!reopenDirs.exists(rel.startsWith) && !rel.endsWith("_SUCCESS"))
            assert(after.get(rel).contains(h),
              s"$dir: closed file $rel changed")
        }

        // 2) decision identity: on-disk artifact ≡ a full re-pack of
        // the union under the composite (batch, md5-key) order
        val union = batch0.withColumn("batch", lit(0L))
          .unionByName(batch1.withColumn("batch", lit(1L)))
          // the artifact excludes zero-token docs (writer contract)
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
          s"$dir: append diverges from the union re-pack")

        // 3) manifest after append ≡ manifest of the union re-pack,
        // and the artifact still verifies clean
        val manNow = Packing.readManifest(spark, s"$tmp/shards")
        val manTruth = Packing.curriculumManifest(truth, "doc_id", "phase")
        assert(manNow.exceptAll(manTruth).count() == 0 &&
          manTruth.exceptAll(manNow).count() == 0,
          s"$dir: manifest diverges after append")
        assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
          .count() == 0, s"$dir: post-append verify")

        // 4) O(new-data) reads: the append touched the manifest (a few
        // metadata-scale passes) and the reopened tails — never the
        // closed shard data. Bound: generous constants on tail +
        // manifest, strictly below one artifact scan (checked only at
        // the largest SF, where the separation is decisive).
        if (dir.endsWith("sf0.1")) {
          val bound = 8L * (tailRows + manRows) + 64L
          assert(rec.get() <= bound,
            s"append read ${rec.get()} records (tail=$tailRows, " +
              s"manifest=$manRows, bound=$bound)")
          assert(bound < segsBefore,
            s"spec self-check: bound $bound must separate from a full " +
              s"artifact scan ($segsBefore rows)")
        }
        Caches.release(spark)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  // -------------------------------------------------------------
  // property: seeded/keyed prefix sum vs plain-Scala ground truth
  // -------------------------------------------------------------

  test("perPhasePackOffsets: batch-ordered and seeded forms match a plain-Scala fold on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(16)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(40)
      val ctx = Seq(4, 16)(rnd.nextInt(2))
      val pps = Seq(1, 3)(rnd.nextInt(2))
      val salt = "-p9"
      // distinct ids; token counts INCLUDE zeros; 1-3 phases; a
      // random batch split (batch 0 may be empty)
      val ids = rnd.shuffle((1L to 500L).toList).take(n)
      val rows = ids.map(id => (id, 1L + rnd.nextInt(3).toLong,
        rnd.nextInt(51).toLong, rnd.nextInt(2).toLong))
      val df = rows.toDF("doc_id", "phase", "n_tokens", "batch")
      // ground truth: per phase, order by (batch, md5(id||salt), id)
      val want = rows.groupBy(_._2).flatMap { case (phase, rs) =>
        val ordered = rs.sortBy(r => (r._4, md5hex(r._1.toString + salt),
          r._1))
        var tok = 0L
        ordered.zipWithIndex.map { case ((id, _, nt, _), i) =>
          val so = tok
          tok += nt
          (id, phase, (i + 1).toLong, so)
        }
      }.toSet
      val got = Packing.perPhasePackOffsets(df, "doc_id", "n_tokens",
          "phase", salt, ctx, pps, preOrderCols = Seq("batch"))
        .select("doc_id", "phase", "pos", "start_offset")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == want, s"trial $trial (n=$n ctx=$ctx): " +
        s"e.g. ${(got -- want).take(2)} vs ${(want -- got).take(2)}")
      // seeded form over batch 1 alone ≡ the union fold's batch-1 rows
      val b0 = rows.filter(_._4 == 0L)
      val b1 = rows.filter(_._4 == 1L)
      if (b1.nonEmpty) {
        val seeds = b0.groupBy(_._2).map { case (p, rs) =>
          (p, rs.map(_._3).sum, rs.length.toLong) }.toSeq
          .toDF("phase", "_tok_base", "_pos_base")
        val gotSeeded = Packing.perPhasePackOffsets(
            b1.toDF("doc_id", "phase", "n_tokens", "batch"),
            "doc_id", "n_tokens", "phase", salt, ctx, pps,
            seeds = Some(seeds))
          .select("doc_id", "phase", "pos", "start_offset")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        val wantSeeded = want.filter(w => b1.exists(_._1 == w._1))
        assert(gotSeeded == wantSeeded, s"trial $trial seeded")
      }
    }
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // p13: mixture sampling executes p11's plan
  // -------------------------------------------------------------

  test("p13: decisions recompute from md5; capped domains keep all; kept mass tracks the plan") {
    val rows = SparkEntry.queries("p13_mixture_sampling")(spark, sfDir)
      .collect()
    val plan = SparkEntry.queries("p11_domain_mixture")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("rate6"), r.getAs[Long]("tokens"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("capped"))))
      .toMap
    def md5res(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id-p13".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (rate, _, _, capped) = plan(r.getAs[String]("lang"))
      assert(r.getAs[Long]("rate6") == rate)
      assert(r.getAs[Boolean]("sampled") == (md5res(id) < rate),
        s"decision of $id")
      if (capped) assert(r.getAs[Boolean]("sampled"),
        s"capped domain must keep $id")
    }
    // the executed sample's token mass tracks the plan's allocation
    // (exact for capped domains; md5-uniform concentration otherwise)
    val kept = rows.filter(_.getAs[Boolean]("sampled"))
      .groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("n_tokens")).sum }
    var sampledSomething = false
    plan.foreach { case (lang, (_, tokens, alloc, capped)) =>
      val k = kept.getOrElse(lang, 0L)
      if (capped) assert(k == tokens, s"$lang capped keeps all tokens")
      else {
        sampledSomething = true
        assert(math.abs(k - alloc) <= alloc / 2 + 100,
          s"$lang kept $k vs alloc $alloc")
      }
    }
    assert(sampledSomething, "at least one domain must be down-sampled")
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // t54: PII redaction
  // -------------------------------------------------------------

  test("t54: plant classes fire their own counters; redaction recomputes in plain Java regex; clean docs untouched") {
    val rows = SparkEntry.queries("t54_pii_redaction")(spark, sfDir)
      .collect()
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val ip = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    def planted(id: Long): String = {
      val sb = new StringBuilder(texts(id))
      if (id % 6 == 1)
        sb ++= s" Reach me at user$id@Example.org for details."
      if (id % 10 == 3)
        sb ++= s" Server at 10.0.${id % 256}.7 responded."
      if (id % 8 == 5)
        sb ++= f" Call 555-867-${id % 10000}%04d today."
      sb.toString
    }
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.nonEmpty)
    var fired = (false, false, false)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = planted(id)
      // counts recompute with plain Java regex over the planted text
      def c(p: String) = p.r.findAllIn(t).size.toLong
      assert(r.getAs[Long]("n_emails") == c(email), s"emails of $id")
      assert(r.getAs[Long]("n_ips") == c(ip), s"ips of $id")
      assert(r.getAs[Long]("n_phones") == c(phone), s"phones of $id")
      // the redacted bytes recompute with the same fixed-order chain
      val red = t.replaceAll(email, "<EMAIL>")
        .replaceAll(ip, "<IP>").replaceAll(phone, "<PHONE>")
      assert(r.getAs[String]("red_fp") == md5hex(red), s"redaction of $id")
      // plant classes fire their own counters
      if (id % 6 == 1) { assert(r.getAs[Long]("n_emails") >= 1)
        fired = fired.copy(_1 = true) }
      if (id % 10 == 3) { assert(r.getAs[Long]("n_ips") >= 1)
        fired = fired.copy(_2 = true) }
      if (id % 8 == 5) { assert(r.getAs[Long]("n_phones") >= 1)
        fired = fired.copy(_3 = true) }
      // a PII-free doc's fingerprint is its ORIGINAL text — the
      // redactor never rewrites clean content
      if (r.getAs[Boolean]("pii_free"))
        assert(r.getAs[String]("red_fp") == md5hex(t), s"clean $id")
    }
    assert(fired == ((true, true, true)), "every plant class must fire")
    assert(rows.exists(_.getAs[Boolean]("pii_free")),
      "clean docs must exist — the corpus is not all-planted")
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // s25/s26 streaming faces: stream ≡ batch
  // -------------------------------------------------------------

  /** Stage the events table as 3 TIME-ORDERED files (ascending
    * modtimes + maxFilesPerTrigger=1 → 3 micro-batches honoring the
    * stateful rungs' ordered-delivery contract) in the TypedEv
    * shape. */
  private def stagedTypedEvents(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ev16")
    val ev = Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("us").as("ts_us"), col("user_id"),
        col("event_type"))
    val Array(q1, q2) = ev.stat.approxQuantile("ts_us",
      Array(0.33, 0.66), 0.0)
    val parts = Seq(
      ev.filter(col("ts_us") <= q1),
      ev.filter(col("ts_us") > q1 && col("ts_us") <= q2),
      ev.filter(col("ts_us") > q2))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ev16_part$i")
      p.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val src = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      val dst = d.resolve(s"b$i.parquet")
      java.nio.file.Files.move(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    d.toString
  }

  test("streamingFunnel: per-user max-stage row equals the batch s25 funnel") {
    import spark.implicits._
    val dir = stagedTypedEvents()
    val raw = spark.readStream
      .schema(Tables.eventsUs(spark, sfDir)
        .select(col("event_id"), col("us").as("ts_us"), col("user_id"),
          col("event_type")).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[graft.streaming.EventStreams.TypedEv]
    val out = graft.streaming.EventStreams.runToCompletion(
      graft.streaming.EventStreams.streamingFunnel(raw).toDF(),
      "funnel16_test", org.apache.spark.sql.streaming.OutputMode.Append)
    // at most 3 rows per user, one per stage transition
    assert(out.groupBy("user_id").count().filter(col("count") > 3)
      .count() == 0)
    val got = out
      .groupBy("user_id")
      .agg(max(struct(col("stage"), col("view_us"), col("click_us"),
        col("purchase_us"))).as("r"))
      .select(col("user_id"), col("r.view_us"), col("r.click_us"),
        col("r.purchase_us"), col("r.stage"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4))).toSet
    val batch = SparkEntry.queries("s25_event_funnel")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4))).toSet
    assert(got == batch,
      s"stream ${got.size} rows vs batch ${batch.size}; " +
        s"e.g. ${(got -- batch).take(2)} / ${(batch -- got).take(2)}")
    // non-vacuous: conversions exist, and the stream really emitted
    // per-stage transition rows (not one terminal row per user)
    assert(batch.exists(_._5 == 3L))
    assert(out.count() > got.size, "expected per-transition emits")
    Caches.release(spark)
  }

  test("streamingRetention: the s26 cohort table folds exactly from the emitted rows") {
    import spark.implicits._
    val dir = stagedTypedEvents()
    val raw = spark.readStream
      .schema(Tables.eventsUs(spark, sfDir)
        .select(col("event_id"), col("us").as("ts_us"), col("user_id"),
          col("event_type")).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[graft.streaming.EventStreams.TypedEv]
    val out = graft.streaming.EventStreams.runToCompletion(
      graft.streaming.EventStreams.streamingRetention(raw).toDF(),
      "ret16_test", org.apache.spark.sql.streaming.OutputMode.Append)
    // fold the s26 table from the emitted rows in plain Scala (a
    // memory-sink self-join trips conflicting-reference resolution)
    val rows = out.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cohort_wk"),
        r.getAs[Long]("week_offset")))
    // one row per (user, cohort, offset) — the emit-once contract
    assert(rows.distinct.length == rows.length)
    val sizes = rows.filter(_._3 == 0L).groupBy(_._2)
      .map { case (c, rs) => c -> rs.length.toLong }
    val got = rows.groupBy(r => (r._2, r._3)).map { case ((c, o), rs) =>
      val nActive = rs.length.toLong
      val cu = sizes(c)
      (c, o, nActive, cu,
        BigDecimal(nActive.toDouble / cu)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val batch = SparkEntry.queries("s26_retention_cohorts")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == batch,
      s"stream ${got.size} cells vs batch ${batch.size}; " +
        s"e.g. ${(got -- batch).take(2)} / ${(batch -- got).take(2)}")
    Caches.release(spark)
  }

  test("CLI pack-append: frozen-schedule phases land new docs; pack-compact collapses the manifest log") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pa").toString
    try {
      val s = spark
      import s.implicits._
      val out = s"$tmp/artifact"
      Console.withOut(new java.io.PrintStream(
          new java.io.ByteArrayOutputStream(), true, "UTF-8")) {
        graft.cli.Demo.run(spark, "pack",
          Map("dir" -> sfDir, "out" -> out, "ctx-size" -> "512",
            "packs-per-shard" -> "4"))
      }
      // sidecars persisted: the artifact is self-describing
      assert(spark.read.parquet(s"$out/_params").count() == 1)
      val cuts = spark.read.parquet(s"$out/_phase_cuts").collect()
        .map(r => (r.getAs[Long]("phase"), r.getAs[Long]("min_bin")))
        .toSeq
      assert(cuts.nonEmpty && cuts.size <= 4)
      // new docs with ids beyond the corpus range; varied text so the
      // FK bins spread across (and beyond) the frozen cut range
      val newDocs = (1 to 12).map { i =>
        (9000000L + i, Seq.fill(20 + i * 7)(
          if (i % 3 == 0) "antidisestablishmentarianism" else "a cat sat")
          .mkString(" ") + ". And then it rested. It slept well.")
      }.toDF("doc_id", "text")
      newDocs.write.parquet(s"$tmp/newdocs")
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        graft.cli.Demo.run(spark, "pack-append",
          Map("out" -> out, "docs" -> s"$tmp/newdocs"))
      }
      assert(buf.toString("UTF-8").contains("appended 12 docs"))
      // the maintained artifact still verifies clean
      assert(Packing.verifyCurriculumShards(spark, out).count() == 0)
      // every new doc landed whole, in the phase the FROZEN cuts
      // dictate (append-after-original ordering is pinned by the
      // library-level union-re-pack spec above)
      val want = TextQueries.phasesFromCuts(
        spark.read.parquet(s"$tmp/newdocs"), cuts).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val back = spark.read.parquet(out)
        .filter(col("doc_id") >= 9000000L)
        .groupBy("doc_id")
        .agg(countDistinct(col("phase")).as("np"),
          first(col("phase").cast("long")).as("phase"),
          sum("seg_tokens").as("tok"))
        .collect()
      assert(back.length == 12, s"${back.length} new docs on disk")
      back.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(r.getAs[Long]("np") == 1L)
        assert(r.getAs[Long]("phase") == want(id)._1, s"phase of $id")
        assert(r.getAs[Long]("tok") == want(id)._2, s"tokens of $id")
      }
      // manifest log: append created gen 1; compaction folds to gen 0
      val rawMan = spark.read.parquet(s"$out/_manifest")
      assert(rawMan.agg(max("gen")).head.getLong(0) == 1L)
      val resolvedBefore = Packing.readManifest(spark, out).collect()
        .map(_.toString).sorted
      Console.withOut(new java.io.PrintStream(
          new java.io.ByteArrayOutputStream(), true, "UTF-8")) {
        graft.cli.Demo.run(spark, "pack-compact", Map("out" -> out))
      }
      val rawAfter = spark.read.parquet(s"$out/_manifest")
      assert(rawAfter.agg(max("gen")).head.getLong(0) == 0L)
      assert(rawAfter.count() == resolvedBefore.length)
      val resolvedAfter = Packing.readManifest(spark, out).collect()
        .map(_.toString).sorted
      assert(resolvedAfter.sameElements(resolvedBefore),
        "compaction must not change the resolved manifest")
      assert(Packing.verifyCurriculumShards(spark, out).count() == 0)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  // -------------------------------------------------------------
  // m20 artifact: CLI export-keyframes
  // -------------------------------------------------------------

  test("CLI export-keyframes: written PNGs ≡ keyframeContent, manifest consistent, bytes re-decode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kf").toString
    try {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        graft.cli.Demo.run(spark, "export-keyframes",
          Map("dir" -> sfDir, "out" -> tmp))
      }
      assert(buf.toString("UTF-8").contains("[export-keyframes] assets="))
      def key(df: DataFrame) = df.select(
          col("asset_id").cast("long"), col("frame_number").cast("int"),
          col("scene_id"), col("width"), col("height"), col("luma_sum"),
          md5(col("png")).as("h"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getInt(4), r.getLong(5), r.getString(6))).toSet
      val back = spark.read.parquet(s"$tmp/frames")
      val sel = SparkEntry.queries("m18_keyframe_select")(spark, sfDir)
        .select(col("asset_id"), col("scene_id"),
          col("keyframe").as("frame_number"))
      val want = graft.operators.PipelineQueries
        .keyframeContent(spark, sfDir, sel)
      assert(key(back) == key(want), "written frames ≠ the m20 chain")
      // manifest consistency: recompute per-asset rows from the files
      val recomputed = back
        .withColumn("asset_id", col("asset_id").cast("long"))
        .withColumn("_k64", graft.operators.Dedup.md5Long(
          concat_ws("|", col("frame_number"), md5(col("png")))))
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("png"))).as("png_bytes"),
          min("scene_id").as("min_scene"),
          max("scene_id").as("max_scene"),
          expr("bit_xor(_k64)").as("content_hash"))
      val man = spark.read.parquet(s"$tmp/frames/_manifest")
      assert(man.exceptAll(recomputed).count() == 0 &&
        recomputed.exceptAll(man).count() == 0, "manifest ≠ files")
      // and the bytes are REAL PNGs: re-decode one and check the dims
      val r0 = back.orderBy("asset_id", "frame_number").head
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r0.getAs[Array[Byte]]("png")))
      assert(img != null && img.getWidth == r0.getAs[Int]("width") &&
        img.getHeight == r0.getAs[Int]("height"))
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("streamingFunnel: stage events tied with the previous stage's first event count (batch ≥ semantics)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tie").toString
    try {
      // user 7: click and purchase TIED with the first view's
      // timestamp, sorting BEFORE it (smaller event_id) — the batch
      // chained mins count both (≥), so the stream must too.
      // user 8: a click strictly BEFORE any view never counts.
      val evs = Seq(
        (1L, 100L, 7L, "purchase"),
        (2L, 100L, 7L, "click"),
        (3L, 100L, 7L, "view"),
        (10L, 50L, 8L, "click"),
        (11L, 60L, 8L, "view"))
        .toDF("event_id", "ts_us", "user_id", "event_type")
      evs.coalesce(1).write.parquet(s"$d/evs")
      val raw = spark.readStream.schema(evs.schema).parquet(s"$d/evs")
        .as[graft.streaming.EventStreams.TypedEv]
      val out = graft.streaming.EventStreams.runToCompletion(
        graft.streaming.EventStreams.streamingFunnel(raw).toDF(),
        "tie16_test", org.apache.spark.sql.streaming.OutputMode.Append)
        .collect()
      val u7 = out.filter(_.getAs[Long]("user_id") == 7L)
        .maxBy(_.getAs[Long]("stage"))
      assert(u7.getAs[Long]("stage") == 3L, s"tied funnel: ${out.toSeq}")
      assert(u7.getAs[Long]("view_us") == 100L &&
        u7.getAs[Long]("click_us") == 100L &&
        u7.getAs[Long]("purchase_us") == 100L)
      val u8 = out.filter(_.getAs[Long]("user_id") == 8L)
        .maxBy(_.getAs[Long]("stage"))
      assert(u8.getAs[Long]("stage") == 1L &&
        u8.getAs[Long]("view_us") == 60L, s"pre-view click: ${out.toSeq}")
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(d))
  }

  test("appendCurriculumShards: int-typed phase columns append correctly (no boxed-type drift)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_appi").toString
    try {
      val s = spark
      import s.implicits._
      val ctx = 16
      val pps = 2
      // phases and token counts as INTs — the writer/appender must
      // canonicalize, or the appender's JVM-side phase comparison
      // (boxed Integer vs the manifest's boxed Long) silently skips
      // the tail reopen and the overwrite drops the tail's rows
      val b0 = Seq((1, 1, 16), (2, 2, 8)).toDF("doc_id", "phase",
        "n_tokens").withColumn("doc_id", col("doc_id").cast("long"))
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctx, pps, s"$tmp/shards")
      val b1 = Seq((11, 2, 8)).toDF("doc_id", "phase", "n_tokens")
        .withColumn("doc_id", col("doc_id").cast("long"))
      Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
        "-p9", ctx, pps, s"$tmp/shards")
      val p2 = spark.read.parquet(s"$tmp/shards")
        .filter(col("phase") === 2 && col("shard_id") === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(p2 == Set(2L, 11L),
        s"int-phased append must reopen the tail, not drop it: $p2")
      assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .count() == 0)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("appendCurriculumShards: refuses to run on a half-committed artifact (crashed-append guards)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_appg").toString
    try {
      val s = spark
      import s.implicits._
      val ctx = 16
      val pps = 2
      val b0 = Seq((1L, 1L, 16L), (2L, 2L, 8L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctx, pps, s"$tmp/shards")
      val b1 = Seq((11L, 2L, 8L)).toDF("doc_id", "phase", "n_tokens")
      // (i) a shard directory beyond the manifest tail — the footprint
      // of an append that died before its manifest append
      val orphan = java.nio.file.Paths.get(s"$tmp/shards/phase=2/shard_id=1")
      java.nio.file.Files.createDirectories(orphan)
      val e1 = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
          "-p9", ctx, pps, s"$tmp/shards")
      }
      assert(e1.getMessage.contains("uncommitted"), e1.getMessage)
      java.nio.file.Files.delete(orphan)
      // (ii) tail bytes diverging from the manifest's description
      val tailFile = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$tmp/shards/phase=2"))
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.delete(tailFile)
      val e2 = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
          "-p9", ctx, pps, s"$tmp/shards")
      }
      assert(e2.getMessage.contains("diverge"), e2.getMessage)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("append parameter guard + shard-budget verifier catch mixed-parameter and doctored artifacts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prm").toString
    try {
      val s = spark
      import s.implicits._
      val b0 = Seq((1L, 1L, 40L), (2L, 1L, 30L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctxSize = 16, packsPerShard = 2, s"$tmp/shards")
      // the writer persisted its own parameters
      val prm = spark.read.parquet(s"$tmp/shards/_params").head
      assert(prm.getAs[Long]("ctx_size") == 16L &&
        prm.getAs[Long]("packs_per_shard") == 2L &&
        prm.getAs[String]("salt") == "-p9")
      // appending with a DIFFERENT ctx would interleave incompatible
      // pack boundaries — must refuse
      val b1 = Seq((10L, 1L, 8L)).toDF("doc_id", "phase", "n_tokens")
      val e = intercept[IllegalArgumentException] {
        Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
          "-p9", ctxSize = 32, packsPerShard = 2, s"$tmp/shards")
      }
      assert(e.getMessage.contains("_params"), e.getMessage)
      // intact artifact: every non-final shard exactly at budget
      assert(Packing.verifyShardBudgets(spark, s"$tmp/shards")
        .count() == 0)
      // a doctored manifest row (non-final shard claiming the wrong
      // token total) is flagged by the budget verifier
      spark.read.parquet(s"$tmp/shards/_manifest")
        .filter(col("shard_id") === 0L)
        .withColumn("tokens", lit(31L))
        .withColumn("gen", lit(99L))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$tmp/shards/_manifest")
      val bad = Packing.verifyShardBudgets(spark, s"$tmp/shards")
        .collect()
      assert(bad.length == 1 && bad.head.getAs[Long]("tokens") == 31L &&
        bad.head.getAs[Long]("expected_tokens") == 32L, bad.toSeq)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("appendCurriculumShards: a shard-aligned phase opens a fresh shard and touches nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_appa").toString
    try {
      val s = spark
      import s.implicits._
      val ctx = 16
      val pps = 2 // shard budget = 32 tokens
      // zero-token docs (4, 12) do NOT participate: no segments, no
      // position — the appended doc 11 must still continue phase 2's
      // stream exactly where doc 3 left it
      val b0 = Seq((1L, 1L, 16L), (2L, 1L, 16L), (3L, 2L, 8L),
          (4L, 2L, 0L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.writeCurriculumShards(b0, "doc_id", "n_tokens", "phase",
        "-p9", ctx, pps, s"$tmp/shards")
      val before = fileHashes(s"$tmp/shards")
      val b1 = Seq((10L, 1L, 8L), (11L, 2L, 8L), (12L, 1L, 0L))
        .toDF("doc_id", "phase", "n_tokens")
      Packing.appendCurriculumShards(b1, "doc_id", "n_tokens", "phase",
        "-p9", ctx, pps, s"$tmp/shards")
      val after = fileHashes(s"$tmp/shards")
      // phase 1 held exactly 32 tokens (one FULL shard): the append
      // must open shard 1 and leave shard 0's bytes untouched
      before.keys.filter(_.startsWith("phase=1/shard_id=0")).foreach { rel =>
        assert(after.get(rel) == before.get(rel), s"phase-1 $rel changed")
      }
      assert(after.keys.exists(_.startsWith("phase=1/shard_id=1")),
        "full phase must continue in a NEW shard")
      // phase 2 was partial: doc 11 lands in the reopened shard 0
      val p2 = spark.read.parquet(s"$tmp/shards")
        .filter(col("phase") === 2 && col("shard_id") === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(p2 == Set(3L, 11L), s"phase-2 tail: $p2")
      // zero-token docs are invisible in the artifact
      assert(spark.read.parquet(s"$tmp/shards")
        .filter(col("doc_id").isin(4L, 12L)).count() == 0)
      // and doc 11 took the position RIGHT AFTER doc 3 — the
      // zero-token doc 4 consumed none
      assert(spark.read.parquet(s"$tmp/shards")
        .filter(col("doc_id") === 11L).select("pos").head.getLong(0)
        == 2L)
      assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .count() == 0)
      // a batch touching ONLY phase 1 must leave phase 2's PARTIAL
      // tail byte-identical — phases the batch never mentions are
      // never read, never rewritten, never re-manifested
      val mid = fileHashes(s"$tmp/shards")
      Packing.appendCurriculumShards(
        Seq((20L, 1L, 8L)).toDF("doc_id", "phase", "n_tokens"),
        "doc_id", "n_tokens", "phase", "-p9", ctx, pps, s"$tmp/shards")
      val fin = fileHashes(s"$tmp/shards")
      mid.keys.filter(_.startsWith("phase=2/")).foreach { rel =>
        assert(fin.get(rel) == mid.get(rel), s"phase-2 $rel changed")
      }
      assert(spark.read.parquet(s"$tmp/shards/_manifest")
        .filter(col("gen") === 2L && col("phase") === 2L).count() == 0,
        "no superseding manifest row for an untouched phase")
      assert(Packing.verifyCurriculumShards(spark, s"$tmp/shards")
        .count() == 0)
      Caches.release(spark)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }
}
