package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventQueries, TextQueries}

/** Round-15 operator specs: the linearized s23/s24 sequential folds
  * (bit-equality on a 10k-step spine, where the round-14 quadratic
  * accumulator measurably stalled), the j3 brace-surgery whitespace
  * robustness, and the textDupDecision members-only keep-rank window. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  // -------------------------------------------------------------
  // s23/s24: linear folds, bit-equal on a 10k-step spine
  // -------------------------------------------------------------

  /** Synthetic (key, hr, c) hourly counts: `steps` CONSECUTIVE hours
    * (no gaps — the fill is exercised separately by the oracle-checked
    * corpus queries), counts a deterministic integer formula. Starts
    * in 2030 so s23's planted 2024 burst window never overlaps. */
  private def syntheticCounts(
      keyName: String, keyVal: String, steps: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2030-01-01 00:00:00").getTime
    (0 until steps)
      .map(i => (keyVal, new Timestamp(t0 + i * 3600L * 1000L),
        ((i.toLong * i) % 7L) + (if (i % 997 == 0) 50L else 0L)))
      .toDF(keyName, "hr", "c")
  }

  test("s23 linear fold: bit-equal to the reference recursion on a 10k-step spine") {
    val steps = 10000
    val cnt = syntheticCounts("event_type", "zz", steps)
    val out = EventQueries.cusumFromCounts(cnt)
      .select("hr_us", "cnt", "cusum", "alarm").collect()
    assert(out.length == steps)
    // reference scan in plain Scala — the exact integer recursion
    val cs = (0 until steps).map(i =>
      ((i.toLong * i) % 7L) + (if (i % 997 == 0) 50L else 0L))
    val d = steps.toLong
    val sumc = cs.sum
    var run = 0L
    var i = 0
    while (i < steps) {
      run = math.max(0L, run + d * cs(i) - 2L * sumc)
      val r = out(i)
      assert(r.getAs[Long]("cnt") == cs(i), s"cnt at $i")
      assert(r.getAs[Long]("cusum") == run, s"cusum at $i")
      assert(r.getAs[Boolean]("alarm") == (run >= 6L * sumc), s"alarm at $i")
      i += 1
    }
  }

  test("s24 linear fold: bit-equal to the 16ths-scaled EWMA recursion on a 10k-step spine") {
    val steps = 10000
    val cnt = syntheticCounts("user_id", "u7", steps)
    val out = EventQueries.ewmaFromCounts(cnt)
      .select("hr_us", "cnt", "ewma16").collect()
    assert(out.length == steps)
    val cs = (0 until steps).map(i =>
      ((i.toLong * i) % 7L) + (if (i % 997 == 0) 50L else 0L))
    var run = -1L
    var i = 0
    while (i < steps) {
      run = if (run < 0) 16L * cs(i) else (3L * run + 16L * cs(i)) / 4L
      val r = out(i)
      assert(r.getAs[Long]("cnt") == cs(i), s"cnt at $i")
      assert(r.getAs[Long]("ewma16") == run, s"ewma16 at $i")
      i += 1
    }
  }

  test("s24 gap fill: missing hours still enter the fold as zeros") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2030-01-01 00:00:00").getTime
    // hours 0, 1 and 4 present — 2 and 3 must be folded as c = 0
    val cnt = Seq((1L, new Timestamp(t0), 8L),
      (1L, new Timestamp(t0 + 3600000L), 4L),
      (1L, new Timestamp(t0 + 4 * 3600000L), 16L))
      .toDF("user_id", "hr", "c")
    val out = EventQueries.ewmaFromCounts(cnt)
      .select("cnt", "ewma16").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(8L, 4L, 0L, 0L, 16L))
    // s: 128, (384+64)/4=112, 336/4=84, 252/4=63, (189+256)/4=111
    assert(out.map(_.getLong(1)).toSeq == Seq(128L, 112L, 84L, 63L, 111L))
  }

  // -------------------------------------------------------------
  // j3: brace surgery survives trailing whitespace
  // -------------------------------------------------------------

  test("j3 plant surgery: props with whitespace around the closing brace still parse") {
    val s = spark
    import s.implicits._
    // event_id 1 (tag plant), 2 (flag plant), 3 (no plant) — each with
    // a whitespace-wrapped closing brace the naive length-1 substr
    // would corrupt into un-parseable JSON (silent row drop in Spark
    // vs an oracle crash in DuckDB)
    val ev = Seq((1L, "{\"k\": \"v\"} \n"), (2L, "{\"k\": \"v\"}\t"),
      (3L, "{\"k\": \"v\"}  "))
      .toDF("event_id", "props")
    val parsed = EventQueries.j3PlantedProps(ev)
      .select(expr("map_keys(from_json(props, 'map<string,string>'))")
        .as("ks"))
      .collect()
    assert(parsed.forall(_.getAs[Seq[String]]("ks") != null),
      "every planted props value must stay a valid JSON object")
    val keys = parsed.map(_.getAs[Seq[String]]("ks").toSet)
    assert(keys(0) == Set("k", "tag") && keys(1) == Set("k", "flag") &&
      keys(2) == Set("k"))
  }

  // -------------------------------------------------------------
  // textDupDecision: members-only keep-rank window
  // -------------------------------------------------------------

  test("textDupDecision: keep-rank window runs over the joined members frame, not the corpus") {
    val dec = TextQueries.textDupDecision(spark, sfDir)
    val plan = dec.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1, s"exactly one keep-rank window: $windows")
    // the window's subtree must be the members INNER join — never a
    // left join whose null side would drag every singleton through
    // the label exchange (the round-14 corpus-wide form)
    val joins = windows.head.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.exists(_ == org.apache.spark.sql.catalyst.plans.Inner),
      s"window input must be the inner members join, got $joins")
    assert(!joins.exists(
        _ == org.apache.spark.sql.catalyst.plans.LeftOuter),
      "no left join may feed the window — singletons bypass it")
    // and singletons rejoin via an anti join + union
    val anti = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty, "singleton pass-through must be a left_anti join")
    Caches.release(spark)
  }

  // -------------------------------------------------------------
  // t52: the dedup stage recomputes from the standalone gates
  // -------------------------------------------------------------

  test("t52 funnel: every stage row recomputes from the standalone gate outputs") {
    val q = SparkEntry.queries
    val funnel = q("t52_filter_funnel")(spark, sfDir).collect()
    assert(funnel.map(_.getAs[String]("stage")).toSeq ==
      Seq("gopher_rules", "blocklist", "dedup", "classifier"))
    val docs = Tables.load(spark, sfDir, "documents")
    val flags = TextQueries.qualityLabels(docs)
      .withColumnRenamed("keep", "g_keep")
      .join(q("t50_toxicity_filter")(spark, sfDir)
        .select(col("doc_id"), col("c4_keep").as("b_keep")), "doc_id")
      .join(TextQueries.textDupDecision(spark, sfDir)
        .select(col("asset_id").as("doc_id"), col("kept").as("d_keep")),
        "doc_id")
      .join(q("t48_quality_classifier")(spark, sfDir)
        .select(col("doc_id"), col("n_tokens"), col("pred_keep")),
        Seq("doc_id"), "left")
      .select(col("g_keep"), col("b_keep"), col("d_keep"),
        coalesce(col("pred_keep"), lit(false)).as("p_keep"),
        coalesce(col("n_tokens"), lit(0L)).as("nt"))
      .collect()
    def fold(p: org.apache.spark.sql.Row => Boolean): (Long, Long) =
      (flags.count(p).toLong, flags.filter(p).map(_.getAs[Long]("nt")).sum)
    val cuts = Seq[org.apache.spark.sql.Row => Boolean](
      _ => true,
      r => r.getAs[Boolean]("g_keep"),
      r => r.getAs[Boolean]("g_keep") && r.getAs[Boolean]("b_keep"),
      r => r.getAs[Boolean]("g_keep") && r.getAs[Boolean]("b_keep") &&
        r.getAs[Boolean]("d_keep"),
      r => r.getAs[Boolean]("g_keep") && r.getAs[Boolean]("b_keep") &&
        r.getAs[Boolean]("d_keep") && r.getAs[Boolean]("p_keep"))
      .map(fold)
    funnel.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("docs_in") == cuts(i)._1, s"docs_in @$i")
      assert(row.getAs[Long]("docs_kept") == cuts(i + 1)._1,
        s"docs_kept @$i")
      assert(row.getAs[Long]("tokens_in") == cuts(i)._2, s"tokens_in @$i")
      assert(row.getAs[Long]("tokens_kept") == cuts(i + 1)._2,
        s"tokens_kept @$i")
    }
    // the dedup stage must actually bite: the corpus carries planted
    // duplicate families at every SF
    val dRow = funnel(2)
    assert(dRow.getAs[Long]("docs_kept") < dRow.getAs[Long]("docs_in"),
      "the dedup stage removed nothing — the funnel is vacuous")
    Caches.release(spark)
  }

  test("t52 oracle: composed CTE name sets stay disjoint") {
    val sql = SparkEntry.oracleSql("t52_filter_funnel")
    val names = "(?i)(?:WITH RECURSIVE|,)\\s*([a-zA-Z_][a-zA-Z0-9_]*) AS \\("
      .r.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSeq
    assert(names.distinct.size == names.size,
      s"duplicate CTE name would silently shadow: $names")
    assert(TextQueries.textDedupCteNames.forall(n => names.contains(n)),
      "the dedup decision chain must be composed in full")
    assert(sql.contains("'dedup'") && sql.contains("'classifier'"))
  }

  test("textDupDecision: members + singletons partition the corpus exactly") {
    val dec = TextQueries.textDupDecision(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    assert(dec.count() == docs.count(), "one decision row per document")
    assert(dec.select("asset_id").distinct().count() == docs.count(),
      "no document decided twice (member/singleton overlap)")
    Caches.release(spark)
  }
}
