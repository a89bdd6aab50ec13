package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventQueries, RelationalQueries, TextAnalysis, TextQueries}

/** Round-7 contract specs, part 3: the Gopher repetition fractions
  * (t35) against hand-derived golden values (including the overlap
  * overcount convention and the < n-token exclusion), and the
  * sliding-window distinct operator (s21) against independently
  * computed per-hop invariants plus its streaming face (per-window HLL
  * state maintained through the generic rollup protocol — no
  * sliding-window-specific state code).
  */
class Round7OpsSpec3 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Write a minimal documents.parquet into a temp dir so the
    * dir-shaped query entry runs on handcrafted text. */
  private def docsDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t35_docs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t35 gopher repetition: hand-derived fractions, overlap overcount, <n exclusion") {
    val dir = docsDir(Seq(
      "x x x x x", // 9 chars: maximal repetition — fractions EXCEED 1
      "a b c d e", // 9 chars: all distinct — dup_frac 0 everywhere
      "a b a b")) // 7 chars: 4 tokens — NO n=5 row
    val rows = TextQueries.queries("t35_gopher_repetition")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // doc 0: "x x"×4 → 4·3/9; "x x x"×3 → 3·5/9; the full 5-gram once
    assert(rows((0L, 2L)) == (1.333333, 1.333333))
    assert(rows((0L, 3L)) == (1.666667, 1.666667))
    assert(rows((0L, 5L)) == (1.0, 0.0))
    // doc 1: every gram unique → top is any 3-char / 5-char / 9-char
    // gram at count 1, dup empty
    assert(rows((1L, 2L)) == (0.333333, 0.0))
    assert(rows((1L, 3L)) == (0.555556, 0.0))
    assert(rows((1L, 5L)) == (1.0, 0.0))
    // doc 2: "a b"×2 beats "b a"×1 on count (2·3/7); trigrams unique
    assert(rows((2L, 2L)) == (0.857143, 0.857143))
    assert(rows((2L, 3L)) == (0.714286, 0.0))
    assert(!rows.contains((2L, 5L)), "4-token doc must yield no n=5 row")
    assert(rows.size == 8)
  }

  test("t35: argmax prefers HIGHEST count, not highest count·chars") {
    // "z z z a b c d a b c d": "z z"×2 (count 2, 6 chars) must beat
    // "a b c d..." 4-grams at count 1 even though... — make it sharp at
    // n=2: "z z" count 2 → 2·3=6 chars vs any count-1 bigram 6+ chars?
    // bigrams here are 3 chars each; use longer distinct tokens so a
    // count-1 bigram has MORE chars than the count-2 top: top must
    // still be the count-2 gram.
    val dir = docsDir(Seq("z z z longword1 longword2")) // 25 chars
    val r = TextQueries.queries("t35_gopher_repetition")(spark, dir)
      .filter(col("n") === 2).collect().head
    // "z z" (count 2, 3 chars → 6) wins over "longword1 longword2"
    // (count 1, 19 chars): 2·3/25, NOT 19/25
    assert(r.getDouble(2) == math.rint(6.0 / 25 * 1e6) / 1e6)
    assert(r.getDouble(3) == math.rint(6.0 / 25 * 1e6) / 1e6)
  }

  test("a41 join-overlap estimator: inclusion–exclusion tracks truth across overlap regimes") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    def est(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
      def sk(xs: Seq[Long]): DataFrame =
        xs.toDF("k").agg(hll_sketch_agg(col("k")).as("sk"))
      val r = sk(a)
        .crossJoin(sk(b).withColumnRenamed("sk", "sk2"))
        .select(hll_sketch_estimate(col("sk")).as("ea"),
          hll_sketch_estimate(col("sk2")).as("eb"),
          hll_sketch_estimate(hll_union(col("sk"), col("sk2")))
            .as("eu"))
        .head()
      (r.getLong(0) + r.getLong(1) - r.getLong(2), r.getLong(2))
    }
    // the union side is estimated with the composite estimator while
    // the direct sides use HIP (the a40 lesson), so the estimator's
    // absolute error scales with |A ∪ B| — the query's contract
    def within(ab: (Long, Long), truth: Long): Boolean =
      math.abs(ab._1 - truth) <= math.max(truth / 10, ab._2 / 20)
    assert(within(est(1L to 500L, 1L to 500L), 500L))
    assert(within(est(1L to 500L, 1001L to 1500L), 0L)) // near-disjoint
    assert(within(est(1L to 500L, 251L to 750L), 250L))
    assert(within(est(1L to 5000L, 10001L to 15000L), 0L))
    // the declared query's contract holds on testdata
    val row = RelationalQueries.queries("a41_join_overlap")(spark, sfDir)
      .head()
    assert(row.getLong(0) > 0 && row.getBoolean(1))
  }

  test("p8 schema evolution: merged read surfaces the late column as NULL on old batches") {
    val rows = TextQueries.queries("p8_schema_evolution")(spark, sfDir)
      .collect()
    val d = Tables.load(spark, sfDir, "documents")
    val nEven = d.filter(col("doc_id") % 2 === 0).count()
    // exactly one NULL-lang group holding every pre-evolution row
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1 && nullRow.head.getLong(1) == nEven)
    assert(rows.map(_.getLong(1)).sum == d.count())
  }

  test("v27 distortion ladder: int8 nearly lossless and above the coarser rungs") {
    import graft.operators.VectorQueries
    val rows = VectorQueries.queries("v27_distortion_ladder")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(rows.keySet == Set("binary", "half", "int8"))
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.values.forall(_._2 == n))
    val int8 = rows("int8")._1
    assert(int8 > 0.999, s"int8 rung should be nearly lossless: $int8")
    assert(int8 > rows("binary")._1 && int8 > rows("half")._1)
    // every rung still points the same general direction
    assert(rows.values.forall(_._1 > 0.0))
  }

  test("t36 NB language classifier: hand-derived model and confusion matrix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t36_docs").toString
    // train slice = doc_id % 3 == 0 → docs 0, 3, 6
    Seq(
      (0L, "hello world hello", "en"),
      (1L, "hello hello", "en"),
      (2L, "bonjour bonjour", "fr"),
      (3L, "bonjour monde bonjour", "fr"),
      (4L, "monde", "fr"), // unseen-in-en token: miss weight decides
      (5L, "world again", "en"),
      (6L, "hello again", "en"))
      .map { case (i, t, l) => (i, t, l, "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // hand NB: en counts {hello 3, world 1, again 1} tot 5, fr counts
    // {bonjour 2, monde 1} tot 3, V=5 → every doc classifies to its
    // gold language (doc 4 hinges on miss_en = ln(1/10) < ln(2/8)+gap)
    val conf = TextQueries.queries("t36_nb_langid")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(conf == Map(("en", "en") -> 4L, ("fr", "fr") -> 3L))
  }

  test("t36: learns — diagonal beats chance on sf0.001") {
    val conf = TextQueries.queries("t36_nb_langid")(spark, sfDir).collect()
    val tot = conf.map(_.getLong(2)).sum
    val diag = conf.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val classes = conf.map(_.getString(0)).distinct.length
    assert(diag.toDouble / tot > 1.0 / classes,
      s"accuracy ${diag.toDouble / tot} not above chance 1/$classes")
  }

  test("t37 BPE training: the classic corpus yields the hand-derived merge sequence") {
    // Sennrich et al.'s worked example shape: low×5 lower×2 newest×6
    // widest×3. Every round's winner (and each tie-break by pair name)
    // is hand-computable.
    val dir = docsDir(Seq(
      "low low low low low lower lower widest widest widest",
      "newest newest newest newest newest newest"))
    val merges = TextQueries.queries("t37_bpe_train")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1L, "e", "s", 9L), // ties s-t on 9, wins on name
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), // ties o-w, wins on name
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L), // ties n-e and w-est, wins on name
      (6L, "ew", "est", 6L)))
  }

  test("bpeSegment: pieces always reassemble the word; piece count monotone in merges") {
    import spark.implicits._
    import org.scalacheck.Gen
    import SparkTestSession.forAll
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w",
      "e" -> "w", "ew" -> "est")
    val wordGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("l", "o", "w", "e", "r", "n", "s", "t"))
        .map(_.mkString))
    forAll(Gen.listOfN(12, wordGen), n = 6) { ws =>
      val df = ws.toDF("w")
      val segs = (0 to merges.length).map { i =>
        df.select(
          TextAnalysis.bpeSegment(org.apache.spark.sql.functions.col("w"),
            merges.take(i)).as("p")).collect().map(_.getSeq[String](0))
      }
      ws.indices.foreach { r =>
        segs.foreach(s => assert(s(r).mkString == ws(r),
          s"pieces ${s(r)} don't reassemble '${ws(r)}'"))
        (1 to merges.length).foreach(i =>
          assert(segs(i)(r).size <= segs(i - 1)(r).size))
      }
    }
  }

  test("t38 BPE encode: hand-derived token counts under the classic tokenizer") {
    // same corpus as the t37 golden; after the 6 hand-derived merges:
    // low→[low]=1, lower→[low,e,r]=3, widest→[w,i,d,est]=4,
    // newest→[n,ewest]=2 (merge 5 makes ew, merge 6 ew+est)
    val dir = docsDir(Seq(
      "low low low low low lower lower widest widest widest",
      "newest newest newest newest newest newest"))
    val rows = TextQueries.queries("t38_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows == Map(
      0L -> (5 * 1 + 2 * 3 + 3 * 4L, 10L), // 23 BPE tokens, 10 words
      1L -> (6 * 2L, 6L)))
  }

  test("ssspRounds: relaxation finds the cheap 2-edge path; round bound is honest") {
    import spark.implicits._
    import graft.operators.Graph
    // 0 -10-> 1 -1-> 2 and a direct 0 -100-> 2: two rounds must find
    // the 11-cost path; one round only the direct 100; node 3 hangs
    // off 2 so it needs three rounds
    val edges = Seq(
      (0L, 1L, 10L), (1L, 2L, 1L), (0L, 2L, 100L), (2L, 3L, 5L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(0L)).toDF("id")
    def dists(r: Int): Map[Long, Long] =
      Graph.ssspRounds(edges, "src", "dst", "w", seeds, r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(dists(0) == Map(0L -> 0L))
    assert(dists(1) == Map(0L -> 0L, 1L -> 10L, 2L -> 100L))
    assert(dists(2) == Map(0L -> 0L, 1L -> 10L, 2L -> 11L, 3L -> 105L))
    assert(dists(3) == Map(0L -> 0L, 1L -> 10L, 2L -> 11L, 3L -> 16L))
  }

  test("s21 sliding distinct: window set, hop bounds, and sketch contract on sf0.001") {
    val out = EventQueries.queries("s21_sliding_distinct")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // every window satisfied the 10% sketch contract (also the oracle's
    // hashed claim — asserted here so a failure localizes to Spark)
    assert(out.forall(_.getBoolean(2)))
    // independent per-hop exact distincts
    val hopUs = 900L * 1000 * 1000
    val hops = Tables.eventsUs(spark, sfDir)
      .select(expr(s"us div $hopUs").as("hop"), col("user_id"))
      .groupBy("hop").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the emitted windows are exactly the union of each hop's 4 windows
    val expectedWins = hops.keySet.flatMap(h => (h - 3) to h)
    assert(out.map(_.getLong(0) / hopUs).toSet == expectedWins)
    // per-window exact distinct is bounded by its constituent hops:
    // max single hop ≤ window ≤ sum of hops (union bounds)
    out.foreach { r =>
      val win = r.getLong(0) / hopUs
      val ds = (win to win + 3).flatMap(hops.get)
      assert(r.getLong(1) >= ds.max && r.getLong(1) <= ds.sum,
        s"window $win: ${r.getLong(1)} outside [${ds.max}, ${ds.sum}]")
    }
  }

  test("s21 streaming face: per-window HLL state via the generic rollup — stream tracks batch exact") {
    import graft.functions.HllRollup
    import spark.implicits._
    // synthetic events: 3 hops, users overlapping across hops so the
    // cross-batch union has work to do
    val hopUs = 900L * 1000 * 1000
    val rows = for { h <- 0L to 2L; u <- 0L until 400L }
      yield (h * hopUs + u, (u * 7 + h * 131) % 500L)
    val df = rows.toDF("us", "user_id")
    val tmp = java.nio.file.Files.createTempDirectory("s21_stream").toString
    df.repartition(3).write.parquet(s"$tmp/src")
    // the same hop→window explode the batch query uses, applied to the
    // STREAM before the generic sketch rollup — the window key makes
    // sliding-NDV just another keyed NDV state, no new protocol
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
      .select(explode(sequence(
        expr(s"us div $hopUs") - 3, expr(s"us div $hopUs"))).as("win"),
        col("user_id"))
    HllRollup.streamingNdv(raw, s"$tmp/state", Seq("win"), "user_id",
        s"$tmp/ckpt")
      .awaitTermination()
    val est = HllRollup.estimates(spark, s"$tmp/state", Seq("win")).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df
      .select(explode(sequence(
        expr(s"us div $hopUs") - 3, expr(s"us div $hopUs"))).as("win"),
        col("user_id"))
      .groupBy("win").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (w, n) =>
      assert(math.abs(est(w) - n) <= math.max(n / 10, 1),
        s"window $w: est ${est(w)} vs exact $n")
    }
  }
}
