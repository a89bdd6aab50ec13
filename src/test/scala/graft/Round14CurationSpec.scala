package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** Round-14 wave-C curation rungs: t50 blocklist screen, t51
  * Flesch–Kincaid readability, p9 curriculum phases, m16 caption
  * quality. The DuckDB oracle pins cross-engine equality at 3 SFs;
  * these specs pin the SEMANTICS (hand goldens, rule isolation,
  * closed-form phase recompute) and the plan shapes (map-only scans,
  * histogram-not-corpus window). */
class Round14CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sfDir).collect()

  // -------------------------------------------------------------
  // t51: hand-golden readability arithmetic
  // -------------------------------------------------------------

  test("t51: FK counts and grade match hand-computed goldens") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat. It ran! Why?"), // 6 words, 3 sents, 6 syll
      (2L, "tv hmm."),                   // vowelless words floor at 1
      (3L, "Pneumonia outbreak?"),       // multi-group words
      (4L, "")                           // empty: floors keep FK finite
    ).toDF("doc_id", "text")
    val out = TextQueries.withReadability(df)
      .select("doc_id", "n_words", "n_sent", "n_syll", "fk")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    def fkOf(w: Long, s: Long, y: Long): Double =
      0.39 * (w.toDouble / s) + 11.8 * (y.toDouble / w) - 15.59

    assert(out(1L)._1 == 6 && out(1L)._2 == 3 && out(1L)._3 == 6)
    assert(out(1L)._4 == fkOf(6, 3, 6))
    // "tv" and "hmm" have no vowel groups -> 1 syllable each
    assert(out(2L) == ((2L, 1L, 2L, fkOf(2, 1, 2))))
    // pneumonia = eu+o+ia -> 3 groups; outbreak = ou+ea -> 2
    assert(out(3L) == ((2L, 1L, 5L, fkOf(2, 1, 5))))
    // empty text: both floors engage, syllables 0
    assert(out(4L) == ((1L, 1L, 0L, fkOf(1, 1, 0))))
  }

  test("t51: per-doc invariants + grade recomputable from emitted counts") {
    val rows = run("t51_readability")
    assert(rows.length > 100)
    rows.foreach { r =>
      val (w, s, y, g) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
      assert(w >= 1 && s >= 1 && y >= 0)
      // every word contributes >= 1 syllable
      assert(y >= w || y == 0, s"doc ${r.getLong(0)}: $y syll < $w words")
      val expect = BigDecimal(
        0.39 * (w.toDouble / s) + 11.8 * (y.toDouble / w) - 15.59)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(g - expect) < 1e-9,
        s"doc ${r.getLong(0)}: emitted $g != recomputed $expect")
    }
  }

  // -------------------------------------------------------------
  // t50: blocklist verdicts
  // -------------------------------------------------------------

  test("t50: plants fire, both policies disagree where designed") {
    val rows = run("t50_toxicity_filter")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val (id, bad) = (r.getLong(0), r.getLong(2))
      val expectBad = (if (id % 7 == 2) 2L else if (id % 7 == 5) 1L else 0L) +
        (if (id % 13 == 8) 1L else 0L)
      assert(bad == expectBad, s"doc $id: n_bad $bad != $expectBad")
      assert(r.getBoolean(4) == (bad == 0))               // c4_keep
      assert(r.getBoolean(5) == (bad * 30 <= r.getLong(1))) // rate_keep
    }
    // all three reachable verdict combos occur (c4-keep implies
    // rate-keep by construction: 0 hits is rate 0)
    val combos = rows.map(r => (r.getBoolean(4), r.getBoolean(5))).toSet
    assert(combos == Set((true, true), (false, true), (false, false)),
      s"verdict combos degenerate: $combos")
    // the planted case variant is normalized: Slurword. counts
    val slur = byId.values.filter(r => r.getLong(0) % 13 == 8)
    assert(slur.nonEmpty && slur.forall(_.getLong(2) >= 1))
  }

  test("t50/t51: map-only scans — no join, no aggregate in the plan") {
    Seq("t50_toxicity_filter", "t51_readability").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$name plan has a join:\n$plan")
      assert(!plan.contains("HashAggregate"),
        s"$name plan has an aggregate:\n$plan")
    }
  }

  // -------------------------------------------------------------
  // p9: curriculum phases
  // -------------------------------------------------------------

  test("p9: four monotone phases matching the histogram closed form") {
    val rows = run("p9_curriculum")
    val n = rows.length.toLong
    val phases = rows.map(_.getLong(3)).toSet
    assert(phases == Set(1L, 2L, 3L, 4L), s"phases: $phases")
    // bin ranges are disjoint and ordered across phases
    val byPhase = rows.groupBy(_.getLong(3)).toSeq.sortBy(_._1)
    byPhase.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) =>
        assert(lo.map(_.getLong(2)).max < hi.map(_.getLong(2)).min)
      case _ =>
    }
    // phase = floor(4 * docs-before-bin / n) + 1, recomputed here from
    // the emitted bins alone (the t18 histogram closed form)
    val counts = rows.groupBy(_.getLong(2)).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var before = 0L
    val expect = counts.map { case (bin, c) =>
      val p = before * 4 / n + 1; before += c; bin -> p
    }.toMap
    rows.foreach { r =>
      assert(r.getLong(3) == expect(r.getLong(2)),
        s"bin ${r.getLong(2)}: phase ${r.getLong(3)} != ${expect(r.getLong(2))}")
    }
    // the shard-writer sort key is the p4 md5 discipline
    rows.take(5).foreach { r =>
      assert(r.getString(4).matches("[0-9a-f]{32}"))
    }
  }

  test("p9: the quantile window runs on the histogram, not the corpus") {
    val df = SparkEntry.queries("p9_curriculum")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // a corpus-wide ntile would sort all rows under one Window keyed
    // by nothing; here the only Window consumes the binned aggregate
    assert(plan.contains("Window"), plan)
    val winIdx = plan.indexOf("Window")
    assert(plan.indexOf("HashAggregate", winIdx) > 0,
      s"window does not sit above the bin histogram:\n$plan")
  }

  // -------------------------------------------------------------
  // m16: caption quality rules fire in isolation
  // -------------------------------------------------------------

  test("m16: each boilerplate rule rejects alone; informative captions keep") {
    val rows = run("m16_caption_quality")
    def rule(r: Row) = (r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))
    val byNorm = rows.groupBy(_.getString(4))

    // 'untitled image': fixed-id plant -> df 2, two words, in-list:
    // rejected by the placeholder list ALONE
    val ui = byNorm("untitled image")
    assert(ui.length == 2)
    ui.foreach { r =>
      assert(rule(r) == ((true, false, true)), r.toString)
      assert(r.getLong(6) == 2 && !r.getBoolean(10))
    }
    // 'stock banner': repeated across n/5 distinct urls -> df reject
    // ALONE (fluent length, not in any list)
    val sb = byNorm("stock banner")
    assert(sb.length >= 50)
    sb.foreach(r => assert(rule(r) == ((true, true, false)) &&
      !r.getBoolean(10), r.toString))
    // 'image': single word placeholder on n/10 urls -> all three fire
    byNorm("image").foreach(r =>
      assert(rule(r) == ((false, false, false)), r.toString))
    // the m14 informative plants survive every rule
    val kept = rows.filter(_.getBoolean(10))
    assert(kept.length >= 400)
    assert(kept.exists(_.getString(4).startsWith("figure ")))
    assert(kept.exists(_.getString(4).startsWith("photo ")))
    // digits are kept by normalization (the df rule depends on it:
    // stripping them would collapse every 'figure N overview' into
    // one mega-df caption)
    assert(kept.exists(_.getString(4).matches("figure [0-9]+ overview")))
  }

  // -------------------------------------------------------------
  // t52: filter funnel
  // -------------------------------------------------------------

  test("t52: funnel rows recompute from the standalone gate queries") {
    val funnel = run("t52_filter_funnel")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6)))).toMap
    // round 15: the dedup stage joined the funnel between blocklist
    // and classifier; round 16: the decontamination stage between
    // dedup and classifier (recomputes pinned in Round15OpsSpec)
    assert(funnel.keySet ==
      Set("gopher_rules", "blocklist", "dedup", "decontaminate",
        "classifier"))
    // per-doc decisions from the standalone hash-checked queries
    // gopher keep = the language-agnostic rule subset, exactly as
    // qualityLabels ANDs it from the t43 rule table
    val gKeep = SparkEntry.queries("t43_gopher_rules")(spark, sfDir)
      .select(col("doc_id"),
        (col("r_wordcount") && col("r_meanwordlen") && col("r_hash") &&
          col("r_ellipsis") && col("r_alpha")).as("keep"))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bKeep = run("t50_toxicity_filter")
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap // c4_keep
    val t48 = run("t48_quality_classifier")
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val pKeep = t48.map(t => t._1 -> t._3).toMap
    val nTok = t48.map(t => t._1 -> t._2).toMap
    val dKeep = graft.operators.TextQueries.textDupDecision(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val ids = gKeep.keySet.toSeq.sorted
    def stage(p: Long => Boolean) =
      (ids.count(p), ids.filter(p).map(nTok.getOrElse(_, 0L)).sum)
    // round 16: decontamination from the standalone d21 output
    // (left-coverage — the %23 benchmark slice passes unscreened)
    val cKeep = run("d21_benchmark_decontamination")
      .map(r => r.getLong(0) -> !r.getBoolean(3)).toMap
    val (n0, t0) = stage(_ => true)
    val (n1, t1) = stage(id => gKeep(id))
    val (n2, t2) = stage(id => gKeep(id) && bKeep(id))
    val (n3, t3) = stage(id => gKeep(id) && bKeep(id) && dKeep(id))
    val (n4, t4) = stage(id => gKeep(id) && bKeep(id) && dKeep(id) &&
      cKeep.getOrElse(id, true))
    val (n5, t5) = stage(id =>
      gKeep(id) && bKeep(id) && dKeep(id) &&
        cKeep.getOrElse(id, true) && pKeep.getOrElse(id, false))
    assert(funnel("gopher_rules") == ((n0.toLong, n1.toLong, t0, t1)))
    assert(funnel("blocklist") == ((n1.toLong, n2.toLong, t1, t2)))
    assert(funnel("dedup") == ((n2.toLong, n3.toLong, t2, t3)))
    assert(funnel("decontaminate") == ((n3.toLong, n4.toLong, t3, t4)))
    assert(funnel("classifier") == ((n4.toLong, n5.toLong, t4, t5)))
    // the funnel is non-degenerate: every stage removes something here
    assert(n0 > n1 && n1 > n2 && n2 > n3 && n3 > n4 && n4 >= n5,
      s"$n0 $n1 $n2 $n3 $n4 $n5")
  }

  // -------------------------------------------------------------
  // s23: CUSUM changepoint
  // -------------------------------------------------------------

  test("s23: full table matches an independent plain-Scala CUSUM fold") {
    val out = run("s23_cusum_changepoint")
    // independent recompute: collect raw (type, hour) in mechanical
    // form (unix micros), then gap-fill, baseline, plant, fold and
    // alarm entirely in plain Scala
    val HourUs = 3600000000L
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getString(0) -> Math.floorDiv(r.getLong(1), HourUs))
    val burstLo = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) / 3600
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (tpe, evs) =>
      val hrs = evs.map(_._2)
      val counts = hrs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val series = (hrs.min to hrs.max)
        .map(h => h -> counts.getOrElse(h, 0L))
      val d = series.length.toLong
      val sumc = series.map(_._2).sum
      val g = 3L * (sumc / d + 1L)
      var s = 0L
      series.map { case (h, c) =>
        val cnt = if (tpe == "click" && h >= burstLo && h < burstLo + 12)
          c + g else c
        s = math.max(0L, s + d * cnt - 2L * sumc)
        (tpe, h * HourUs, cnt, s, s >= 6L * sumc)
      }
    }.sortBy(t => (t._1, t._2))
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expect)
    // the planted burst alarms at every SF by construction; noise
    // alarms outside it are legitimate detector output, but the burst
    // itself must fire
    assert(got.exists(t => t._1 == "click" && t._5 &&
      t._2 >= burstLo * HourUs && t._2 < (burstLo + 12) * HourUs),
      "planted burst did not alarm")
  }

  // -------------------------------------------------------------
  // m17: scene cuts
  // -------------------------------------------------------------

  test("m17: no false cuts, near-total boundary recall, exact luma replay") {
    val rows = run("m17_scene_cuts")
    // scene structure: sceneLen = 1 + id % 3; within-scene frames are
    // bit-identical, so a cut anywhere else is a decode/detector bug
    var boundaries = 0; var cuts = 0
    rows.foreach { r =>
      val (id, j, cut) = (r.getLong(0), r.getInt(1), r.getBoolean(4))
      val sl = 1 + (id % 3).toInt
      if (j > 0 && j % sl == 0) boundaries += 1
      if (cut) { cuts += 1; assert(j > 0 && j % sl == 0,
        s"false cut at asset $id frame $j") }
    }
    assert(boundaries > 0 && cuts >= boundaries * 95 / 100,
      s"recall degenerate: $cuts of $boundaries")
    // scene_id ≡ running cut count, recomputed per asset
    rows.groupBy(_.getLong(0)).foreach { case (_, fs) =>
      var s = 0L
      fs.sortBy(_.getInt(1)).foreach { r =>
        if (r.getBoolean(4)) s += 1
        assert(r.getLong(5) == s)
      }
    }
    // one asset's luma re-derived in plain Scala from the fill formula
    // — pins the REAL zip→PNG→decode chain against pure arithmetic
    val id = 5L
    val (w, h, sl) = (1 + (id % 16).toInt, 1 + (id % 8).toInt,
      1 + (id % 3).toInt)
    def luma(j: Int): Long = {
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id * 2654435761L + (j / sl) * 69069L + x * 97L + y * 31L) &
          0xffffffL
        sum += (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
          (v & 0xff) * 114) / 1000
      }
      sum
    }
    rows.filter(_.getLong(0) == id).foreach { r =>
      assert(r.getLong(2) == luma(r.getInt(1)),
        s"luma mismatch at frame ${r.getInt(1)}")
    }
  }

  test("m18: one keyframe per scene, consistent with m17's cut table") {
    val frames = run("m17_scene_cuts")
    val keys = run("m18_keyframe_select")
    // exactly one row per (asset, scene); scene lengths sum back to
    // the full frame count
    val scenes = frames.map(r => (r.getLong(0), r.getLong(5))).distinct
    assert(keys.length == scenes.length)
    assert(keys.map(_.getLong(4)).sum == frames.length)
    // each keyframe is the scene's FIRST frame and carries its luma
    val byScene = frames.groupBy(r => (r.getLong(0), r.getLong(5)))
    keys.foreach { k =>
      val fs = byScene((k.getLong(0), k.getLong(1)))
      val first = fs.minBy(_.getInt(1))
      assert(k.getInt(2) == first.getInt(1), k.toString)
      assert(k.getLong(3) == first.getLong(2), k.toString)
      assert(k.getLong(4) == fs.length.toLong)
    }
  }

  // -------------------------------------------------------------
  // a43 / s24 / j3: grouping sets, EWMA, key inventory
  // -------------------------------------------------------------

  test("a43: subtotals and grand total recompute from the detail rows") {
    val rows = run("a43_grouping_sets")
    def g(r: Row) = (r.getLong(4), r.getLong(5))
    val detail = rows.filter(g(_) == ((0L, 0L)))
    val subRf = rows.filter(g(_) == ((0L, 1L)))
    val total = rows.filter(g(_) == ((1L, 1L)))
    assert(detail.nonEmpty && subRf.nonEmpty && total.length == 1)
    assert(rows.length == detail.length + subRf.length + 1)
    // each rf subtotal = sum of its detail rows; grand total = all
    subRf.foreach { s =>
      val d = detail.filter(_.getString(0) == s.getString(0))
      assert(s.getLong(2) == d.map(_.getLong(2)).sum, s.toString)
      assert(s.isNullAt(1))
    }
    assert(total.head.getLong(2) == detail.map(_.getLong(2)).sum)
    assert(total.head.isNullAt(0) && total.head.isNullAt(1))
  }

  test("s24: the 16ths-scaled EWMA recursion refolds from emitted counts") {
    val rows = run("s24_ewma_smoothing")
    rows.groupBy(_.getLong(0)).foreach { case (_, series) =>
      var e = -1L
      series.sortBy(_.getLong(1)).foreach { r =>
        val c = r.getLong(2)
        e = if (e < 0) 16 * c else (3 * e + 16 * c) / 4
        assert(r.getLong(3) == e, r.toString)
      }
    }
    // smoothing is real: somewhere the smoothed value differs from
    // the raw count (else the fold is an identity)
    assert(rows.exists(r => r.getLong(3) != 16 * r.getLong(2)))
  }

  test("j3: planted keys surface with the designed spread") {
    val rows = run("j3_key_inventory")
    val byKey = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(byKey.keySet == Set("k", "flag", "tag"))
    val n = byKey("k")._1 // every event carries k
    // thirds of the corpus carry each planted shape
    assert(math.abs(byKey("tag")._1 - n / 3) <= 1)
    assert(math.abs(byKey("flag")._1 - n / 3) <= 1)
    assert(byKey("tag")._2 == 5 && byKey("flag")._2 == 1)
  }

  test("g10: modularity components brute-recompute from pairs + labels") {
    val row = run("g10_modularity").head
    val (m, nc, intra, sd2, q) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    // independent recompute at sf0.001: collect the co-purchase pairs
    // and the g5 community sizes, rebuild every component in Scala
    val pairs = graft.operators.GraphQueries.copurchasePairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val labels = {
      import org.apache.spark.sql.functions.{col => c}
      val e = graft.operators.GraphQueries.copurchasePairs(spark, sfDir)
      val und = e.union(e.select(c("dst").as("src"), c("src").as("dst")))
      graft.operators.Graph.labelPropagation(und, "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(m == pairs.length)
    assert(intra ==
      pairs.count(p => labels(p._1) == labels(p._2)))
    val dsum = edges.groupBy(e => labels(e._1)).view
      .mapValues(_.length.toLong).toMap
    assert(nc == dsum.size)
    assert(sd2 == dsum.values.map(d => d * d).sum)
    val expectQ = BigDecimal(
      (4.0 * m * intra - sd2) / (4.0 * m * m))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(q - expectQ) < 1e-9, s"$q vs $expectQ")
    // inside the metric's range; on this tiny dense graph 3-round LP
    // collapses to ONE community, where Q = 0 EXACTLY by the identity
    // (intra = m, Σd_c² = 4m²) — the sf0.1 bench corpus partitions
    // into ~170 communities at Q ≈ 0.036
    assert(q >= -0.5 && q < 1)
    if (nc == 1) assert(q == 0.0 && intra == m)
    Caches.release(spark)
  }

  test("CLI report mode prints the five-stage funnel") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      graft.cli.Demo.run(spark, "report", Map("dir" -> sfDir))
    }
    val lines = buf.toString("UTF-8").linesIterator
      .filter(_.startsWith("[report]")).toSeq
    // round 15: dedup; round 16: decontaminate
    assert(lines.size == 6, s"header + 5 stage rows: $lines")
    for (st <- Seq("gopher_rules", "blocklist", "dedup", "decontaminate",
        "classifier"))
      assert(lines.exists(_.contains(st)), s"missing $st row in:\n$lines")
    Caches.release(spark)
  }

  test("m19: segments are exactly the planted speech runs") {
    val rows = run("m19_silence_segments")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (st, en, nw) = (r.getInt(2), r.getInt(3), r.getLong(4))
      // contiguous, and never containing a planted-silent window
      assert(nw == en - st + 1, r.toString)
      (st to en).foreach(w => assert(w % 3 != 2, r.toString))
    }
    // per asset: runs are {3k, 3k+1} truncated at the window count,
    // so the segment count is ceil(W/3) for W = ceil(n_samples / 32)
    rows.groupBy(_.getLong(0)).foreach { case (id, segs) =>
      val n = 256 + (id % 128).toInt
      val wCount = (n + 31) / 32
      val expect = (wCount + 2) / 3
      assert(segs.length == expect,
        s"asset $id: ${segs.length} segments, expected $expect")
    }
  }

  test("m16: extraction is m14's — the extra plant only appends rows") {
    val m14 = run("m14_image_captions")
    val m16 = run("m16_caption_quality")
    val extraUrls = Set("/sb.png", "/pl.png", "/ui.png")
    def isExtra(url: String) = extraUrls.exists(url.endsWith)
    val m16Core = m16.filterNot(r => isExtra(r.getString(3)))
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    val m14Keys = m14
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(m16Core == m14Keys)
    assert(m16.length == m14.length + m16.count(r => isExtra(r.getString(3))))
  }
}
